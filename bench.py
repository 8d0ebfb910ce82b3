"""Per-round benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], times the flagship
extraction job on a bench-scale synthetic transcripts corpus (incl. one
skewed mega-conversation), and — unless SPARK_GRAFT_NO_SCALING=1 —
measures the same extraction job in two fresh subprocess JVMs at
local[8] and local[32] to evidence the N→4N scaling-efficiency criterion
(BASELINE.md sandbox protocol).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "sec", "queries": {...}, "sf": ...,
   "extraction": {...}, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline query subset: one per operator family, heaviest variants
HEADLINE = [
    "pricing_summary",      # hash agg over lineitem
    "lookup_join",          # broadcast join
    "sessionize",           # window gaps-and-islands
    "sort_key",             # regex parse + global sort
    "explode_tokens",       # explode + agg
    "sanitize_latex",       # 97-step replace chain
    "ref_scan",             # regex sweep
    "lang_id",              # text analysis
    "token_count",
    "dedup_exact",
    "dedup_minhash_lsh",    # shingle → minhash → LSH join
    "dedup_ngram_jaccard",  # inverted-index similarity join
    "dedup_simhash",
    "cosine_topk",          # brute-force ANN baseline
    "ann_ivf",              # IVF ANN scale path
    "multimodal_decode",    # Arrow-batch decode plumbing
]

BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))
BENCH_SKEW_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_SKEW", "8000"))


def main() -> None:
    from pdf_extractor_spark.job.session import get_spark
    from pdf_extractor_spark.queries import QUERIES

    spark = get_spark(app_name="bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
    timings: dict[str, float] = {}

    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        # force full materialization of every column (count() would let
        # Catalyst prune the computed columns away)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    # ---- flagship extraction throughput on the bench corpus ------------
    corpus_dir = os.path.join(
        tempfile.gettempdir(),
        f"bench_corpus_{BENCH_CONVS}_{BENCH_SKEW_TURNS}",
    )
    marker = os.path.join(corpus_dir, "_SUCCESS")
    if not os.path.exists(marker):
        from pdf_extractor_spark.gen.distributed import generate_corpus_df

        (
            generate_corpus_df(
                spark, BENCH_CONVS, seed=42,
                skew_conv_turns=BENCH_SKEW_TURNS, partitions=64,
            )
            .write.mode("overwrite")
            .parquet(corpus_dir)
        )

    from pdf_extractor_spark.job.extract import run_extract

    transcripts = spark.read.parquet(corpus_dir)
    n_turns = transcripts.count()
    t0 = time.time()
    out_dir = tempfile.mkdtemp(prefix="bench_extract_out_")
    run_extract(transcripts).write.mode("overwrite").parquet(out_dir)
    extract_wall = time.time() - t0
    timings["extract_pipeline"] = round(extract_wall, 3)
    extraction = {
        "turns": n_turns,
        "wall_s": round(extract_wall, 3),
        "turns_per_sec": round(n_turns / extract_wall, 1),
    }
    spark.stop()

    # ---- N vs 4N scaling (fresh JVM per level, CPU-pinned like a
    # cgroup-limited cluster container so local[N] really gets N cores) --
    scaling = {}
    if os.environ.get("SPARK_GRAFT_NO_SCALING") != "1":
        import shutil

        worker = os.path.join(REPO, "scripts", "bench_extract_worker.py")
        have_taskset = shutil.which("taskset") is not None
        results = {}
        for cores in (8, 32):
            cmd = [sys.executable, worker, str(cores), corpus_dir]
            if have_taskset:
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            proc = subprocess.run(
                cmd,
                capture_output=True, text=True, timeout=1800,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
            try:
                results[cores] = json.loads(line)
            except json.JSONDecodeError:
                results[cores] = {"error": proc.stderr[-500:]}
        if all("tps" in results.get(c, {}) for c in (8, 32)):
            t8, t32 = results[8]["tps"], results[32]["tps"]
            scaling = {
                "turns_per_sec_local8": t8,
                "turns_per_sec_local32": t32,
                "speedup": round(t32 / t8, 3),
                "efficiency": round((t32 / t8) / (32 / 8), 3),
            }
        else:
            scaling = {"error": results}

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "bench_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extraction": extraction,
        "scaling": scaling,
    }))


if __name__ == "__main__":
    main()
