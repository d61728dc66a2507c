"""Extra isolation benchmarks for the optimization round (guide §1.4):
per-stage noop-sink timings and Spark-job counts for the expensive bench
rows. NOT part of the frozen driver bench — cited in OPTIMIZATION_r09.md.

Usage:
    python bench_extra.py corpus      # corpus_admission stage breakdown
    python bench_extra.py img         # img_admission stage breakdown
    python bench_extra.py semantic    # semantic_dedup breakdown
    python bench_extra.py row <name>  # min-of-N of one bench row (warm)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402  (reuses the frozen harness's session + workloads)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


class Probe:
    """Labels a timed phase and counts the Spark jobs it launched."""

    def __init__(self, spark):
        self.spark = spark
        self.rows = []

    def run(self, label: str, fn):
        sc = self.spark.sparkContext
        group = f"probe-{label}-{len(self.rows)}"
        sc.setJobGroup(group, label)
        sc.setJobDescription(label)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        try:
            jobs = len(self.spark.sparkContext.statusTracker().getJobIdsForGroup(group))
        except Exception:
            jobs = -1
        self.rows.append((label, round(dt, 3), jobs))
        print(f"  {label:<42s} {dt:7.3f}s  jobs={jobs}")
        return out


def probe_corpus(spark) -> None:
    import __spark_entry__ as E
    from tilecloud_chain_spark.operators import corpus as CP

    p = Probe(spark)
    print("== corpus_admission breakdown ==")
    # warm the relevant kernels once
    bench.w_corpus_admission(spark, SF_DIR)

    for rep in range(2):
        print(f"-- rep {rep} --")
        pages, profiles, lm_thunk, eval_df, _ext = p.run(
            "inputs:build(lazy)", lambda: E._corpus_inputs(spark, SF_DIR))
        bw, pw = p.run("inputs:lm_train(build)", lm_thunk)
        p.run("inputs:profiles.collect", lambda: profiles.collect())
        p.run("inputs:bw.collect", lambda: bw.collect())
        p.run("inputs:pw.collect", lambda: pw.collect())
        p.run("inputs:eval_df.noop", lambda: _noop(eval_df))

        extracted = CP.extract_stage(pages).localCheckpoint(eager=False)
        p.run("op:extract.noop", lambda: _noop(extracted))
        redacted = CP.redact_stage(extracted)
        p.run("op:redact.noop", lambda: _noop(redacted))
        p.run("op:lang.noop", lambda: _noop(CP.lang_stage(extracted, profiles)))
        p.run("op:lm.noop", lambda: _noop(CP.lm_stage(extracted, bw, pw, -3_480_000)))
        p.run("op:quality.noop", lambda: _noop(CP.quality_stage(extracted)))
        p.run("op:dedup.noop", lambda: _noop(CP.dedup_stage(redacted)))
        p.run("op:decontam.noop", lambda: _noop(CP.decontam_stage(redacted, eval_df)))

        p.run("FULL w_corpus_admission",
              lambda: bench.w_corpus_admission(spark, SF_DIR))


def probe_corpus2(spark) -> None:
    """Finer decomposition: inputs:build and dedup_stage internals."""
    import __spark_entry__ as E
    from tilecloud_chain_spark.operators import corpus as CP
    from tilecloud_chain_spark.operators import dedup as DD
    from tilecloud_chain_spark.operators import text as TX
    from tilecloud_chain_spark.operators.lm import train_bigram_lm
    from pyspark.sql.window import Window

    p = Probe(spark)
    print("== corpus_admission fine breakdown ==")
    bench.w_corpus_admission(spark, SF_DIR)

    for rep in range(2):
        print(f"-- rep {rep} --")
        pages, profiles, lm_thunk, eval_df, _ext = E._corpus_inputs(spark, SF_DIR)
        bw, pw = lm_thunk()
        ext = CP.extract_stage(pages).localCheckpoint(eager=False)
        p.run("ext.materialize(count)", lambda: ext.count())
        sl = ext.filter(F.expr("doc_id % 7 = 0")).select(
            F.col("clean_text").alias("text"))
        p.run("vocab.count", lambda: sl.select(
            F.explode(TX.tokens(F.lower(F.col("text")))).alias("w")
        ).distinct().count())
        bw2, pw2 = train_bigram_lm(sl)
        p.run("bw2.collect", lambda: bw2.collect())
        p.run("pw2.collect", lambda: pw2.collect())
        red = CP.redact_stage(ext).localCheckpoint(eager=False)
        p.run("red.materialize(count)", lambda: red.count())
        exact_keep = F.col("doc_id") == F.min("doc_id").over(
            Window.partitionBy(F.md5(F.col("text"))))
        p.run("exact_window.noop", lambda: _noop(
            red.select("doc_id", exact_keep.alias("exact_keep"))))
        prs = p.run("minhash_star_pairs.noop+build", lambda: (
            lambda d: (_noop(d), d)[1])(DD.minhash_dedup_pairs(
                red.select("doc_id", "text"), threshold=0.5,
                exact_pairs="star")))
        p.run("cc.count", lambda: DD.connected_components(prs).count())
        flags = E.q_corpus_admission(spark, SF_DIR)  # rebuilt fully
        p.run("FULL.agg", lambda: flags.agg(
            F.count("*"), F.sum(F.col("admitted").cast("long")),
            F.sum("n_tokens")).collect())


def probe_img(spark) -> None:
    import __spark_entry__ as E
    from tilecloud_chain_spark.operators.image_curation import (
        aspect_bucket_pack, clip_filter, epoch_schedule, image_admission,
        phash_decontaminate,
    )
    from tilecloud_chain_spark.operators.image_dedup import image_caption_dedup

    p = Probe(spark)
    print("== img_admission breakdown ==")
    bench.w_img_admission(spark, SF_DIR)

    for rep in range(2):
        print(f"-- rep {rep} --")
        imgs, ev, pairs = p.run(
            "inputs:build", lambda: E._ic_admission_inputs(spark, SF_DIR))
        p.run("op:clip.noop", lambda: _noop(clip_filter(pairs, 0.1)))
        p.run("op:decontam.noop",
              lambda: _noop(phash_decontaminate(imgs, ev, 2)))
        p.run("op:dedup.noop", lambda: _noop(image_caption_dedup(imgs, 6)))
        adm = p.run("op:admission(all).noop", lambda: (
            lambda a: (_noop(a), a)[1])(image_admission(
                imgs, eval_df=ev, clip_pairs=pairs, clip_threshold=0.1,
                dedup_hamming=6, decontam_hamming=2, batch_size=64)))
        p.run("op:epoch_schedule.noop", lambda: _noop(
            epoch_schedule(adm.filter(F.col("admitted")), world_size=8)))
        p.run("FULL w_img_admission",
              lambda: bench.w_img_admission(spark, SF_DIR))


def probe_semantic(spark) -> None:
    from tilecloud_chain_spark.operators.similarity import (
        kmeans_fit, semantic_dedup,
    )

    p = Probe(spark)
    print("== semantic breakdown ==")
    bench.w_semantic_dedup(spark, SF_DIR)
    for rep in range(3):
        print(f"-- rep {rep} --")
        embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).repartition(spark.sparkContext.defaultParallelism)
        cents = p.run("kmeans_fit(k=32,iters=1)",
                      lambda: kmeans_fit(embs, k=32, iters=1))
        cent_df = spark.createDataFrame(
            [(j, [float(x) for x in cents[j]]) for j in range(len(cents))],
            "cluster int, cvec array<double>",
        )
        p.run("semantic_dedup.count",
              lambda: semantic_dedup(embs, cent_df, threshold=0.97).count())
        p.run("FULL w_semantic", lambda: bench.w_semantic_dedup(spark, SF_DIR))


def probe_row(spark, names: list[str], reps: int = 3) -> None:
    p = Probe(spark)
    for name in names:
        fn = bench.WORKLOADS[name]
        fn(spark, SF_DIR)  # warm
        for _ in range(reps):
            p.run(f"row:{name}", lambda: fn(spark, SF_DIR))


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "corpus"
    spark = bench._session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    if what == "corpus":
        probe_corpus(spark)
    elif what == "corpus2":
        probe_corpus2(spark)
    elif what == "img":
        probe_img(spark)
    elif what == "semantic":
        probe_semantic(spark)
    elif what == "row":
        probe_row(spark, sys.argv[2:])
    else:
        raise SystemExit(f"unknown probe {what}")
    spark.stop()


if __name__ == "__main__":
    main()
