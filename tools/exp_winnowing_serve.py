"""Winnowing-index SERVING-path rehearsal (r7 verdict task 2's scale
claim, measured): the maintained per-fp df side table lets
match_winnowing_index read the banned set instead of re-windowing the
full posting table per serving call. This times one serving call —
a bounded batch of new documents matched against a stored index built
from the corpus — with the df-table fast path vs the read-time-window
fallback, at each SF dir.

  fast  use_df_table=True  (shipped serving path: banned-fp anti-join
        on the bounded batch, batch broadcast into ONE narrow stored
        scan, countDistinct pair collapse — zero stored-side shuffles)
  slow  use_df_table=False (the r7 read path: stored distinct +
        fp-keyed count window + join — the full-index exchange the
        side table exists to delete)

Two corpus arms per dir (r8 verdict task 4: the bare arm measured a
0-match join at sf1/sf10 — the synthetic corpus has no cross-doc
shared runs at that scale, so the pairing join and the df cap were
never value-exercised by the scale numbers):

  bare     the corpus as generated (comparable to the r8 artifact)
  planted  every indexed doc gets (a) a fixed boilerplate sentence
           appended — its fingerprints exceed max_df, so the banned
           set is non-empty and the df-cap anti-join prunes real
           rows — and (b) a 20-token run UNIQUE to that doc; every
           batch doc carries the unique run of its even neighbor
           (doc_id−1, always indexed), so each batch doc shares a
           verbatim run with exactly one stored doc at df=1 and
           n_matches > 0 with real pairing fanout.

The planted run must be unique-per-doc, not cloned corpus text: the
first r9 attempt cloned the neighbor's full text and matched at sf1
but produced 0 matches at sf10 — which also EXPLAINS the r8 0-match
mystery. The ×K scale corpus replicates each base doc's body verbatim
across K copies (only a trailing salt differs), so at sf10 every
body fingerprint has df ≈ 50 > max_df = 8 and the boilerplate cap
bans the entire cross-copy duplicate mass. That is the cap doing its
job (cross-copy "dups" ARE template noise at that multiplicity); a
match join exercised at scale therefore needs df-surviving planted
runs.

Match answers are verified identical (fast == slow) per arm before
timing. The INDEX BUILD is outside the timed region — the experiment
isolates the per-call serving cost, which is what a decontamination
service pays per submission.

Usage: python tools/exp_winnowing_serve.py OUT.json SF_DIR [SF_DIR...]
Protocol: 1 warm+verify + 2 timed per path per arm per dir, min
recorded.

MEASURED (EXP_WINNOWING_SERVE.json, r8, bare arm, stated honestly):
there is a CROSSOVER. At toy index sizes the window fallback is
cheaper (sf0.1, 51k postings: 0.83 vs 1.10 s — the fast path pays two
extra jobs for the banned-set read and the broadcast build). The fast
path wins from sf1 up and grows with the SCAN, not the shuffle: sf1
(593k postings) 1.10 vs 1.22 s; sf10 (6.8M) 1.69 vs 1.83 s min-of-2
and 1.68 vs 3.24 s first-run. At a 100 TB index the window path
re-shuffles the entire posting table per serving call while the fast
path stays a narrow broadcast-probed scan. r9's planted arm
(EXP_WINNOWING_SERVE_r9.json) repeats the comparison with a non-empty
match join and a non-empty banned set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lrmr_spark.operators import text as TX
from lrmr_spark.session import get_spark
from lrmr_spark.tables import load

BATCH_DOCS = 200  # the bounded serving batch (a submission burst)
# ~20 fixed tokens: long enough to survive winnowing selection into
# multiple fingerprints, appended to EVERY indexed doc so its fps'
# df = n_indexed_docs >> max_df (banned)
BOILER = (
    "standard corpus header line alpha beta gamma delta epsilon zeta "
    "eta theta iota kappa lambda mu nu xi omicron pi"
)


def main() -> None:
    out_path = sys.argv[1]
    dirs = sys.argv[2:] or ["/root/repo/.scratch/sf1"]
    spark = get_spark("exp-winnowing-serve")
    import hostcal

    cal = hostcal.host_cal(spark)  # self-describing artifact (r8 task 8)
    spark.range(1000).selectExpr("sum(id)").collect()
    results: dict[str, dict] = {}
    for sf_dir in dirs:
        tag = os.path.basename(os.path.normpath(sf_dir))
        d = load(spark, sf_dir, "documents")
        for arm in ("bare", "planted"):
            if arm == "bare":
                corpus = d
                batch = (
                    d.filter(F.col("doc_id") % 2 == 1)
                    .orderBy("doc_id")
                    .limit(BATCH_DOCS)
                )
            else:
                # per-doc unique 20-token run: df=1, survives the cap
                def uniq_run(id_col):
                    return F.concat_ws(
                        " ",
                        F.transform(
                            F.sequence(F.lit(1), F.lit(20)),
                            lambda j: F.concat(
                                F.lit("uq"),
                                id_col.cast("string"),
                                F.lit("x"),
                                j.cast("string"),
                            ),
                        ),
                    )

                corpus = d.withColumn(
                    "text",
                    F.concat_ws(
                        " ", F.col("text"), uniq_run(F.col("doc_id")),
                        F.lit(BOILER),
                    ),
                )
                batch = (
                    d.filter(F.col("doc_id") % 2 == 1)
                    .select(
                        "doc_id",
                        F.concat_ws(
                            " ", F.col("text"),
                            uniq_run(F.col("doc_id") - 1),
                            F.lit(BOILER),
                        ).alias("text"),
                    )
                    .orderBy("doc_id")
                    .limit(BATCH_DOCS)
                )
            batch = batch.localCheckpoint(eager=True)
            idx = os.path.join(
                "/root/repo/.scratch", f"winserve_{arm}_{tag}"
            )
            if not os.path.exists(os.path.join(idx, "_meta")):
                # two epochs so the stored side is genuinely multi-epoch
                TX.write_winnowing_index(
                    corpus.filter(F.col("doc_id") % 4 == 0), idx,
                    "doc_id", "text", epoch=0,
                )
                TX.write_winnowing_index(
                    corpus.filter(F.col("doc_id") % 4 == 2), idx,
                    "doc_id", "text", epoch=1,
                )
            n_post = spark.read.parquet(f"{idx}/postings").count()
            max_df = int(TX._read_winnowing_meta(spark, idx)["max_df"])
            n_banned = (
                spark.read.parquet(f"{idx}/df")
                .filter(F.col("df") > max_df)
                .count()
            )

            def run(use_df: bool):
                return TX.match_winnowing_index(
                    batch, idx, "doc_id", "text", min_shared=2,
                    use_df_table=use_df,
                )

            golden = None
            for name, use_df in (
                ("fast_df_table", True), ("slow_window", False)
            ):
                rows = sorted(map(tuple, run(use_df).collect()))
                if golden is None:
                    golden = rows
                elif rows != golden:
                    raise AssertionError(f"{name}/{arm} diverges at {tag}")
                if arm == "planted" and not rows:
                    raise AssertionError(
                        f"planted arm produced 0 matches at {tag}"
                    )
                secs = []
                for _ in range(2):
                    t0 = time.time()
                    run(use_df).count()
                    secs.append(round(time.time() - t0, 3))
                results.setdefault(name, {}).setdefault(arm, {})[tag] = {
                    "min_sec": min(secs),
                    "runs": secs,
                    "n_matches": len(rows),
                    "index_postings": n_post,
                    "banned_fps": n_banned,
                }
                print(
                    f"{name}/{arm} @ {tag}: {secs} (postings={n_post}, "
                    f"matches={len(rows)}, banned={n_banned})",
                    file=sys.stderr, flush=True,
                )
    payload = {
        "experiment": "winnowing serving path: df side table vs read-time window, bare vs planted overlap (r9)",
        "batch_docs": BATCH_DOCS,
        "protocol": "index build excluded; 1 warm+verify + 2 timed per path per arm per dir, min recorded",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "host_cal": cal,
        "paths": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
