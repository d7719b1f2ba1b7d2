"""Concurrent readers must return exactly what a lone reader returns.

The serving plane runs searches in a thread pool under a SHARED read
lock (server/app.py _read_op), and the native executors/scorers release
the GIL during their ctypes calls while owning per-instance scratch
(seen/touched/acc in native.cpp QSeg, HostScorer, GlobalHostScorer).
Round 5 found silently corrupted totals/ranks under 8-way concurrency
(303/1920 mismatches); per-instance locks now serialize scratch use.
≙ reference: concurrent readers on one glass database are safe by
design (immutable btrees, per-cursor state - backends/glass/);
our flat-slab executors needed the explicit lock.
"""

import random
import threading

from xapiand_tpu.database import Database
from xapiand_tpu.query.dsl import QueryDSL


def test_concurrent_searches_match_sequential():
    db = Database()
    rng = random.Random(5)
    cats = [f"c{j}" for j in range(10)]
    for i in range(8000):
        db.index_document(
            {"body": " ".join(rng.choices([f"w{j}" for j in range(150)],
                                          k=10)),
             "cat": rng.choice(cats),
             "price": rng.uniform(1, 100)}, doc_id=str(i))
        if i % 4000 == 3999:
            db.commit()
    db.commit()
    dsl = QueryDSL(db.schema)
    irs = [dsl.parse({"_and": [{"cat": f"c{j % 10}"},
                               {"body": f"w{j % 30}"}]})
           for j in range(8)]
    irs += [dsl.parse({"_or": [{"body": f"w{j}"}, {"body": f"w{j + 40}"}]})
            for j in range(6)]
    irs += [dsl.parse({"body": {"_phrase": f"w{j} w{j + 1}"}})
            for j in range(4)]
    seq = [db.search(ir, k=10) for ir in irs]
    bad = []

    def worker(tid):
        r = random.Random(tid)
        for _ in range(30):
            j = r.randrange(len(irs))
            res = db.search(irs[j], k=10)
            if res.total != seq[j].total or \
                    [h.id for h in res.hits] != [h.id for h in seq[j].hits]:
                bad.append((tid, j, res.total, seq[j].total))

    ths = [threading.Thread(target=worker, args=(t,)) for t in range(8)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    assert not bad, bad[:10]
