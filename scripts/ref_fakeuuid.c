/* Minimal libuuid replacement: RFC4122 v1 (time) and v4 (random). */
#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include <sys/time.h>
#include "uuid/uuid.h"

static unsigned long long rnd64(void) {
    static int seeded = 0;
    if (!seeded) {
        FILE *f = fopen("/dev/urandom", "rb");
        unsigned s = 12345;
        if (f) { if (fread(&s, sizeof s, 1, f) != 1) s ^= 0x9e3779b9u; fclose(f); }
        srandom(s);
        seeded = 1;
    }
    return ((unsigned long long)random() << 33) ^
           ((unsigned long long)random() << 11) ^ (unsigned long long)random();
}

void uuid_generate_time(uuid_t out) {
    static unsigned long long node = 0;
    static unsigned short clockseq = 0;
    struct timeval tv;
    gettimeofday(&tv, 0);
    /* 100ns intervals since 1582-10-15 */
    unsigned long long t = (unsigned long long)tv.tv_sec * 10000000ULL
        + (unsigned long long)tv.tv_usec * 10ULL + 0x01B21DD213814000ULL;
    if (!node) {
        node = rnd64() | 0x010000000000ULL;  /* multicast bit: random node */
        clockseq = (unsigned short)(rnd64() & 0x3fff);
    }
    out[0] = (unsigned char)(t >> 24); out[1] = (unsigned char)(t >> 16);
    out[2] = (unsigned char)(t >> 8);  out[3] = (unsigned char)t;
    out[4] = (unsigned char)(t >> 40); out[5] = (unsigned char)(t >> 32);
    out[6] = (unsigned char)(0x10 | ((t >> 56) & 0x0f));
    out[7] = (unsigned char)(t >> 48);
    out[8] = (unsigned char)(0x80 | (clockseq >> 8));
    out[9] = (unsigned char)clockseq;
    int i; for (i = 0; i < 6; i++) out[10 + i] = (unsigned char)(node >> (8 * (5 - i)));
}

void uuid_generate_random(uuid_t out) {
    int i; unsigned long long a = rnd64(), b = rnd64();
    for (i = 0; i < 8; i++) out[i] = (unsigned char)(a >> (8 * i));
    for (i = 0; i < 8; i++) out[8 + i] = (unsigned char)(b >> (8 * i));
    out[6] = (unsigned char)(0x40 | (out[6] & 0x0f));
    out[8] = (unsigned char)(0x80 | (out[8] & 0x3f));
}

void uuid_generate(uuid_t out) { uuid_generate_random(out); }
void uuid_clear(uuid_t uu) { memset(uu, 0, 16); }
int uuid_compare(const uuid_t a, const uuid_t b) { return memcmp(a, b, 16); }
void uuid_copy(uuid_t dst, const uuid_t src) { memcpy(dst, src, 16); }
int uuid_is_null(const uuid_t uu) {
    int i; for (i = 0; i < 16; i++) if (uu[i]) return 0; return 1;
}
int uuid_parse(const char *in, uuid_t uu) {
    unsigned b[16]; int n = sscanf(in,
        "%2x%2x%2x%2x-%2x%2x-%2x%2x-%2x%2x-%2x%2x%2x%2x%2x%2x",
        b,b+1,b+2,b+3,b+4,b+5,b+6,b+7,b+8,b+9,b+10,b+11,b+12,b+13,b+14,b+15);
    if (n != 16) return -1;
    int i; for (i = 0; i < 16; i++) uu[i] = (unsigned char)b[i];
    return 0;
}
void uuid_unparse_lower(const uuid_t uu, char *out) {
    sprintf(out, "%02x%02x%02x%02x-%02x%02x-%02x%02x-%02x%02x-%02x%02x%02x%02x%02x%02x",
        uu[0],uu[1],uu[2],uu[3],uu[4],uu[5],uu[6],uu[7],
        uu[8],uu[9],uu[10],uu[11],uu[12],uu[13],uu[14],uu[15]);
}
void uuid_unparse_upper(const uuid_t uu, char *out) {
    sprintf(out, "%02X%02X%02X%02X-%02X%02X-%02X%02X-%02X%02X-%02X%02X%02X%02X%02X%02X",
        uu[0],uu[1],uu[2],uu[3],uu[4],uu[5],uu[6],uu[7],
        uu[8],uu[9],uu[10],uu[11],uu[12],uu[13],uu[14],uu[15]);
}
void uuid_unparse(const uuid_t uu, char *out) { uuid_unparse_lower(uu, out); }
