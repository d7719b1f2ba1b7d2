#!/bin/sh
# Rebuild the reference (Kronuz/Xapiand) from /root/reference for the
# measured baseline rows (scripts/ref_baseline.py, config_bench.py).
# /tmp is wiped between rounds - this script reconstructs the whole build
# environment. Takes hours on the 1-core host; run under nice.
#
# Pieces:
#  - /tmp/refsrc      patched source copy (GCC-12 fixes)
#  - /tmp/fakeuuid    minimal libuuid (uuid/uuid.h + libuuid.a)
#  - /tmp/fakebin     tclsh shim -> Python port of uniParse.tcl
#  - /tmp/force_std.h -include'd into every TU (<limits>, <functional>)
#  - /tmp/xbuild      ninja build dir; binary at /tmp/xbuild/bin/xapiand
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"

mkdir -p /tmp/fakebin /tmp/fakeuuid/uuid
cp "$HERE/ref_uniparse.py" /tmp/fakebin/uniparse.py
printf '#!/bin/sh\nexec python3 /tmp/fakebin/uniparse.py "$2" "$3" "$4"\n' \
    > /tmp/fakebin/tclsh
chmod +x /tmp/fakebin/tclsh

cp "$HERE/ref_fakeuuid.c" /tmp/fakeuuid/fakeuuid.c
cat > /tmp/fakeuuid/uuid/uuid.h <<'EOF'
#ifndef FAKE_UUID_H
#define FAKE_UUID_H
typedef unsigned char uuid_t[16];
#ifdef __cplusplus
extern "C" {
#endif
void uuid_generate(uuid_t out);
void uuid_generate_random(uuid_t out);
void uuid_generate_time(uuid_t out);
void uuid_clear(uuid_t uu);
int uuid_compare(const uuid_t a, const uuid_t b);
void uuid_copy(uuid_t dst, const uuid_t src);
int uuid_is_null(const uuid_t uu);
int uuid_parse(const char *in, uuid_t uu);
void uuid_unparse(const uuid_t uu, char *out);
void uuid_unparse_lower(const uuid_t uu, char *out);
void uuid_unparse_upper(const uuid_t uu, char *out);
#ifdef __cplusplus
}
#endif
#endif
EOF
gcc -O2 -c /tmp/fakeuuid/fakeuuid.c -o /tmp/fakeuuid/fakeuuid.o -I/tmp/fakeuuid
ar rcs /tmp/fakeuuid/libuuid.a /tmp/fakeuuid/fakeuuid.o

if [ ! -d /tmp/refsrc ]; then
    cp -r /root/reference /tmp/refsrc
    chmod -R u+w /tmp/refsrc
    # GCC-12 fixes: missing std headers (most covered by the forced
    # include below, these two predate it and are kept for safety)
    sed -i '0,/^#include/s//#include <limits>\n#include/' \
        /tmp/refsrc/src/prometheus/histogram.cc
    sed -i '0,/^#include/s//#include <functional>\n#include/' \
        /tmp/refsrc/src/msgpack.h
    sed -i '0,/^#include/s//#include <limits>\n#include/' \
        /tmp/refsrc/src/xapian/backends/documentinternal.h
    # glibc GNU strerror_r returns char*; the cmake probe lacks <string.h>
    # so STRERROR_R_CHAR_P never defines and the XSI branch miscompiles
    sed -i 's/^# ifdef STRERROR_R_CHAR_P/# if 1 \/* glibc GNU strerror_r *\//' \
        /tmp/refsrc/src/xapian/common/errno_to_string.cc
fi

printf '#include <limits>\n#include <functional>\n' > /tmp/force_std.h

PATH=/tmp/fakebin:$PATH cmake -S /tmp/refsrc -B /tmp/xbuild -G Ninja \
    -DCMAKE_BUILD_TYPE=Release -DLTO=OFF \
    -DUUID_INCLUDE_DIR=/tmp/fakeuuid -DUUID_LIBRARY=/tmp/fakeuuid/libuuid.a \
    -DCMAKE_CXX_FLAGS="-include /tmp/force_std.h"
PATH=/tmp/fakebin:$PATH nice -n 19 ninja -C /tmp/xbuild "$@"
