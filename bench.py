"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (r10, VERDICT r9 ask #2): the FINAL stdout line is a
COMPACT JSON summary — {"metric", "value", "unit", "queries" (per-query
minima), "probe" (medians only), "sf"} — sized to survive the driver's
tail-capture window (BENCH_r09 grew the single line past it and parsed as
null).  The verbose per-run dispersion and full probe samples are printed
on an EARLIER stdout line (prefixed "BENCH_DETAIL ") and also written to
``bench_detail.json`` next to this script.

Each query is materialized with a count() after a cold plan build; the
timing includes scan + shuffle + aggregation (what a user pays), not
collect-to-driver serialization of full results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_data_warehouse_and_analytics_project_spark.registry import all_queries
from sql_data_warehouse_and_analytics_project_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    qs = all_queries()
    headline = {n: rq for n, rq in qs.items() if rq.headline}

    # Honest warmup (VERDICT r01): touch every source table's parquet
    # footers so no timed query pays first-touch file metadata or session
    # startup.
    from sql_data_warehouse_and_analytics_project_spark.sources import tpch

    for t in tpch.TABLES:
        tpch.load(spark, sf_dir, t).count()

    # r13 (VERDICT r12 ask #6): count() above reads only footers — data
    # pages stay cold, so whichever text-heavy query ran FIRST paid the
    # physical read of documents.text (the root cause of dedup_cdc_chunks'
    # 3.8–8.2 s run-to-run dispersion, BENCH_NOTES_r12). Touch every
    # column's data pages once, untimed, so headline numbers stop
    # depending on random query order. One aggregate per table forces a
    # full decode without collecting rows.
    from pyspark.sql import functions as F

    for t in tpch.TABLES:
        df = tpch.load(spark, sf_dir, t)
        df.agg(F.count(F.xxhash64(*df.columns)).alias("_touch")).collect()

    # Per query: one untimed warm run IMMEDIATELY before two timed runs,
    # reporting the minimum. The warm run absorbs whole-stage-codegen
    # compilation (the 64-agg minhash stage alone costs ~12s of Janino
    # compile); it must be adjacent to the timed runs because the JVM's
    # generated-class cache holds ~100 entries and a full-set warmup pass
    # evicts the early queries' classes again (observed 3.5s..16.5s for the
    # same LSH query under a global warmup pass). On a real cluster the
    # compile happens once per executor JVM and amortizes over the job, so
    # steady-state is the honest per-query cost. The cache is cleared
    # before every run so each query pays its own .cache() materialization
    # and earlier queries' caches can't GC-thrash later ones.
    # r4 (VERDICT r3 ask #7): n timed runs per query, report the MIN (the
    # least-noise estimator on a VM whose background phases measured
    # identical code at 14s vs 21s across rounds) plus a per-query
    # dispersion field (all samples + max/min spread) so a real regression
    # is distinguishable from machine noise when comparing rounds.
    # r6 note: a 2-warm + System.gc() variant was measured and REJECTED —
    # the forced full GC on the 128 GiB heap plus the doubled cache
    # materialization made dispersion worse (one 54s simhash outlier), so
    # the harness stays bit-compatible with r5 for cross-round comparison.
    # SPARK_GRAFT_BENCH_WARMS is kept as an experiment knob (default 1).
    # r9 (VERDICT r8 ask #2): the r8 suite read 26% slower than r7 with a
    # code delta touching none of the benched paths — sandbox contention
    # during the bench window is a documented failure mode ("identical code
    # at 14s vs 21s across rounds"). Full-suite interleaving was considered
    # and rejected: the JVM generated-class cache holds ~100 entries, so
    # round-robin passes re-evict early queries' codegen exactly like the
    # global-warmup scheme r4 removed (observed 3.5s..16.5s for the same LSH
    # query). Instead a PINNED PROBE — two fixed workloads whose code never
    # changes across rounds — is timed before the suite, between every query
    # block, and after, so environmental drift is measured on identical code
    # spanning the whole window and divides out of round-over-round
    # comparison: drift_factor = probe_median(round N) / probe_median(round M).
    #   cpu probe: integer hash-agg over spark.range — pure JVM compute,
    #     no I/O, one tiny generated class (cannot meaningfully perturb the
    #     codegen cache).
    #   scan probe: full lineitem scan + decimal sum — parquet decode +
    #     page-cache I/O path.
    def _probe_cpu() -> float:
        t0 = time.perf_counter()
        spark.range(0, 40_000_000, 1, 32).selectExpr(
            "sum((id * 2654435761) % 1000003) AS s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    def _probe_scan() -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).selectExpr(
            "sum(cast(l_extendedprice as decimal(28,4))) AS s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    probe_samples: dict[str, list[float]] = {"cpu": [], "scan": []}

    def _sample_probes() -> None:
        probe_samples["cpu"].append(_probe_cpu())
        probe_samples["scan"].append(_probe_scan())

    # untimed probe warmup (codegen for the two probe plans), then the
    # opening samples
    _probe_cpu(), _probe_scan()
    _sample_probes()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    warms = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_WARMS", "1")))

    # r11 (VERDICT r10 ask #2): rotate the query ORDER deterministically per
    # round so tail-window machine contention doesn't always land on the
    # same queries (r10's five >2x readings all sat in the last third of the
    # alphabetical order). The rotation seeds off git HEAD — stable within a
    # round, different across rounds, no RNG — and is recorded in the
    # detail sidecar. Per-query minima and the pinned probes are
    # order-independent, so cross-round comparison is unaffected.
    names = sorted(headline)
    seed = 0
    try:
        import hashlib
        import subprocess

        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True,
            timeout=10,
        ).stdout.strip()
        if head:
            seed = int(hashlib.md5(head).hexdigest()[:8], 16)
    except Exception:
        pass  # no git → fixed order, still a valid bench
    rot = seed % len(names) if names else 0
    order = names[rot:] + names[:rot]
    if (seed >> 8) & 1:
        order = order[::-1]

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in order:
        rq = headline[name]
        for _ in range(warms):
            spark.catalog.clearCache()
            rq.fn(spark, sf_dir).count()
        samples[name] = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = rq.fn(spark, sf_dir)
            df.count()
            samples[name].append(round(time.perf_counter() - t0, 3))
        timings[name] = min(samples[name])
        _sample_probes()  # one probe pair after every query block
    spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)

    def _stats(s: list[float]) -> dict:
        srt = sorted(s)
        mid = len(srt) // 2
        median = srt[mid] if len(srt) % 2 else round((srt[mid - 1] + srt[mid]) / 2, 3)
        return {"runs": s, "min": min(s), "median": median, "max": max(s)}

    # Verbose record: full per-run dispersion + full pinned-probe samples
    # (the drift instrument — identical code every round; divide a round's
    # probe median by another round's to get the environment drift factor
    # between their bench windows). Printed on an EARLY line and persisted
    # to a sidecar so the driver's tail capture never has to carry it.
    detail = {
        "order": order,
        "dispersion": {
            n: {"runs": s, "spread": round(max(s) - min(s), 3)}
            for n, s in samples.items()
        },
        "probe": {k: _stats(v) for k, v in probe_samples.items()},
    }
    detail_json = json.dumps(detail)
    print("BENCH_DETAIL " + detail_json, flush=True)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"),
            "w",
        ) as fh:
            fh.write(detail_json + "\n")
    except OSError:
        pass  # sidecar is best-effort; the stdout detail line already has it

    # FINAL line: compact, driver-parseable (probe medians only).
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "probe": {
                    k: _stats(v)["median"] for k, v in probe_samples.items()
                },
                "sf": sf,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
