#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as a full cold execution (plan + scan + collect);
a warmup pass on a small query first removes JVM/Python-worker
startup from the measurements.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# The headline set: one per operator family — scan-heavy agg, star
# join, window, set-op/topk, dedup (exact + LSH), ANN, text, dynamo
# source, streaming.
HEADLINE = [
    "b11_agg_flagship_q1",
    "b06_multiway_join",
    "b05_broadcast_join",
    "b09_range_join",
    "b14_agg_rollup",
    "b15_window_rank",
    "b17_window_frames",
    "b18_topk",
    "c01_dedup_exact",
    "c02_dedup_minhash_lsh",
    "c03_ann_cosine_topk",
    "c04_text_token_stats",
    "a04_dynamo_scan",
    "a04_dynamo_scan_fact",
    "s01_stream_tumbling_window",
]

# LLM-pipeline additions (VERDICT r2 #6): timed and reported the same
# way but totaled separately ("extra_total") so "value" stays
# round-over-round comparable with BENCH_r01/r02's 15-query headline.
EXTRA = [
    "c07_corpus_prep",
    "c02_dedup_components",
    "c16_inverted_index",
    # round-4 representatives: widest TPC-H composite, bucketed
    # sweep-line windows, hash-shuffled text pipeline
    "b72_tpch_q8_market_share",
    "b84_peak_concurrency",
    "c38_boilerplate_ngrams",
    # round-5-parked representatives: joinless corpus pair counting,
    # single-sort nearest as-of over the event stream
    "c51_skipgram_cooccurrence",
    "b104_asof_nearest_join",
    # round-6 representatives: sliding-gram substring dedup (widest
    # shingling pass), hashed importance weights (explode + broadcast
    # weight table)
    "c83_substring_gram_dedup",
    "c85_dsir_importance",
    # round-8 design-depth entries: AQE runtime skew split, the
    # single-corpus-scan dedup pipeline (includes its signature-
    # staging write), DPP-pruned on-disk IVF probe
    "b140_aqe_skew_join",
    "c99_unified_dedup_pipeline",
    "c03_ann_ivf_pruned",
    # round-9 design-depth entries: int8-quantized ANN scan, blocked
    # edit-distance verify, mergeable KMV sketch + its pairwise
    # overlap algebra
    "c100_ann_int8_topk",
    # c101_dedup_edit_distance: parked zz_diag_ (superseded by c110,
    # 34x wall at 10x data) — dropped from bench extras per VERDICT r12
    "c102_kmv_sketch_rollup",
    "c103_kmv_source_overlap",
    "c108_simhash_hamming_pairs",
    # round-10 design-depth entries: verdict-shaped edit-distance dedup
    # (replica cliques collapse before pairwise work), the single-scan
    # corpus profiler capstone, stdlib-zlib PNG decode via mapInPandas
    "c110_edit_distance_verdict",
    "c111_corpus_profile",
    "c05_multimodal_png",
    "c112_bpe_train",
    "c114_ann_ivf_pq_rerank",
    "c113_bpe_encode",
    # round-11 design-depth entries: serving-path tokenizer (Arrow
    # mapInPandas over raw text with broadcast merges), unigram-LM
    # hard-EM training, binary-code hamming scan (cheapest ANN rung),
    # baseline-JPEG entropy decode
    "c115_tokenizer_encode",
    "c116_unigram_lm_train",
    "c118_ann_binary_hamming",
    "c05_multimodal_jpeg",
    "c119_unigram_encode",
    # round-12 design-depth entries: FLAC lossless decode (fixed +
    # LPC subframes, STREAMINFO-MD5 self-verified per doc), streaming
    # near-dup verdicts with signature-group collapse (the s26
    # quadratic-ledger fix — 1.59x at 100x vs 19.43x)
    "c05_multimodal_flac",
    "s28_stream_neardup_verdict",
    "s29_stream_neardup_dynamo_state",
    # the video modality: MJPEG-in-AVI container walk + idx1
    # cross-check + per-frame baseline-JPEG decode, stride-2 sampling
    "c05_multimodal_video",
    # from-scratch LZW (dictionary coder, LSB-first bit order)
    "c05_multimodal_gif",
    # ingest-time decontamination (bench state bootstrapped once,
    # per-batch broadcast check, append-only hit ledger)
    "s30_stream_decontamination",
    # windowed audio features (integer-exact energy/peak/variation)
    "c05_audio_features",
    # pixel-row features through the real PNG decode
    "c05_image_features",
    # tokenize-at-ingest per-source token ledger
    "s31_stream_tokenize_state",
    # the early-change LZW + IFD container (the other convention)
    "c05_multimodal_tiff",
    # run-length family floor (cheapest codec: dispatch overhead)
    "c05_multimodal_bmp_rle",
    # prefix-dimension recall (the MRL axis of the compression ladder)
    "c120_matryoshka_recall",
    # round-13 design-depth entries: fixed-point spectral features
    # (quantized-trig DFT, hash-exact), and the landing-zone capstone
    # (decontaminate -> dedup -> tokenize -> pack, single-scan staged)
    "c05_audio_spectral",
    "c121_train_shards_capstone",
    # progressive JPEG (7-scan SOF2; the linear-CPU codec class —
    # dearest extra, priced by its codec not its plan)
    "c05_multimodal_jpeg_progressive",
    # float MFCC (rows-only contract; banded pytest is its oracle)
    "c122_audio_mfcc",
    # round-13 codec variants: Adam7 interlaced PNG, paletted PNG,
    # interlaced+LCT GIF (decode->re-encode->decode lct cycle)
    "c05_multimodal_png_adam7",
    "c05_multimodal_png_paletted",
    "c05_multimodal_gif_interlaced",
    # round-14 design-depth entries: the streaming landing-zone
    # capstone (one stream, four carried states, c121's manifest) and
    # MPEG-1 Layer I audio (the closed-form MPEG layer; frame walk +
    # requantizer self-inversion)
    "s34_stream_landing_zone_capstone",
    "c05_multimodal_mpeg_audio",
    # loader-side manifest consumer (hash-bucket assignment, no global rank)
    "c124_shard_assignment",
    # 12-bit SOF1 JPEG (16-bit DQT path; same codec class as jpeg)
    "c05_multimodal_jpeg12",
    # hierarchical DHP/EXP/SOF5 pyramid (two frames + expansion filter)
    "c05_multimodal_jpeg_hier",
    # round-15: the streaming shard consumer (s34 chain + incremental
    # pack-closure emission at the s35 budget)
    "s35_stream_shard_consumer",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from spark_dynamodb_spark.registry import load_all
    from spark_dynamodb_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    registry = load_all()
    specs = {
        name: registry.resolve(name) for name in HEADLINE + EXTRA + ["b01_scan_full"]
    }

    # Warmup 1: JVM + python worker pool + parquet footer caches.
    specs["b01_scan_full"].fn(spark, sf_dir).count()
    # Warmup 2: run every query once at the smallest sf — the
    # generated whole-stage code is identical, so this pre-fills the
    # Janino codegen cache (wide-aggregate plans cost seconds to
    # compile on first execution) without touching the measured data.
    # This sweep covers EXTRAS too even though they also get a
    # discarded measured-SF warmup run: a round-15 A/B showed the
    # HEADLINE total rides on the whole-session JIT warmth this sweep
    # provides (headline 7.7 s with the full sweep vs 10.4 s with a
    # headline-only sweep, calibration steady) — trimming it would
    # break value's comparability with BENCH_r01+.
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        for name in HEADLINE + EXTRA:
            try:
                specs[name].fn(spark, warm_sf).count()
            except Exception as e:  # noqa: BLE001 — warmup must not kill the bench
                print(f"# warmup {name} failed: {e}", file=sys.stderr)
    # Warmup 3: materialize the keyed stores at the measured sf so the
    # dynamo timings measure scan throughput, not table creation.
    from spark_dynamodb_spark.sources.dynamo_queries import (
        _ensure_customer_kv,
        _ensure_events_kv,
        _ensure_lineitem_kv,
    )

    _ensure_customer_kv(spark, sf_dir)
    _ensure_events_kv(spark, sf_dir)
    _ensure_lineitem_kv(spark, sf_dir)

    # Five measured runs per query (VERDICT r4 #7): this box shows
    # 30-50% run-to-run noise (shared-host effects — e.g. c02 measured
    # 2.1 s and 3.4 s in back-to-back bench invocations of identical
    # code). "value" stays min-based for round-over-round
    # comparability with BENCH_r01–r04; the median totals are the
    # dispersion line that separates real deltas from host noise.
    RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    # Extras run budget (VERDICT r14 #6, revised twice after
    # measurement — the full story in PLANS.md section bench-budget):
    # the extras block grew past 60 entries and min-of-5 pushed one
    # bench invocation past 20 minutes. The 15-query HEADLINE keeps
    # min-of-5 (the round-over-round contract). EXTRAS since round 15:
    # the FIRST measured-SF run is a DISCARDED warmup (recorded as
    # warmup_sec), then min-of-EXTRA_RUNS (2) measured runs. The
    # discard is load-bearing: a plain min-of-2/3 trial read the
    # streaming-staging family 2-4.5x high (cold fixture staging in
    # run 1; s30 26.9 s vs its true warm 5 s). A single-measured-run
    # variant was ALSO rejected: one trial caught s34's only sample
    # at 52 s against a 17.9-32 s band — the >15 s entries carry the
    # in-session variance, so exactly they need the second sample.
    EXTRA_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_RUNS", "2"))

    from spark_dynamodb_spark.maintenance import release_cached

    n_samples: dict[str, int] = {}
    warmup_secs: dict[str, float] = {}

    def measure(
        names: list[str],
        runs: int,
        discard_first: bool = False,
    ) -> tuple[dict[str, float], dict[str, float]]:
        mins: dict[str, float] = {}
        medians: dict[str, float] = {}
        for name in names:
            fn = specs[name].fn
            if discard_first:
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                warmup_secs[name] = round(time.perf_counter() - t0, 3)
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                samples.append(time.perf_counter() - t0)
            n_samples[name] = len(samples)
            # release pinned RDDs BETWEEN QUERIES, not between runs
            # (VERDICT r11 #7): this bounds executor storage across the
            # 60-query bench without changing the measurement
            # methodology — r1-r11 never released, so per-run release
            # was measured to inflate cache-using entries' mins (c101
            # 5.99 -> 8.2 s, c113 9.8 -> 12.9 s) purely by re-paying
            # intra-query .cache() builds that any real repeated
            # workload would reuse. Cross-QUERY leakage (the r10 c110
            # artifact class) is still impossible.
            release_cached(spark)
            mins[name] = round(min(samples), 3)
            medians[name] = round(statistics.median(samples), 3)
            print(
                f"# {name}: min {mins[name]:.3f}s median {medians[name]:.3f}s"
                f" ({n} rows)",
                file=sys.stderr,
            )
        return mins, medians

    # Calibration (VERDICT r13 #3): a fixed JVM-only query timed at
    # this exact point of the run (post-warmup, pre-measurement) — no
    # parquet, no Python workers, no shuffle — so its wall time moves
    # only with host contention. CAL_REF's provenance matters: it is
    # pinned from THIS line's own output on a quiet session (the JIT
    # state at the calibration point differs from a fresh session). CAL_REF pins a quiet-session
    # reading on this box; value_calibrated = value * CAL_REF /
    # calibration_sec rescales the headline total to quiet-host units
    # so round-over-round comparisons can separate shared-host noise
    # (uniform drift, calibration moves too) from plan regressions
    # (calibration steady, one query moves). Normalization rule
    # documented in PLANS.md §noise-calibration.
    CAL_REF = 0.137  # min in-bench (post-warmup) on a quiet session, 2026-08-16
    cal_samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        cal_samples.append(time.perf_counter() - t0)
    calibration = round(min(cal_samples), 3)
    print(f"# calibration: min {calibration:.3f}s median "
          f"{statistics.median(cal_samples):.3f}s (ref {CAL_REF})",
          file=sys.stderr)

    timings, med = measure(HEADLINE, RUNS)
    extra, extra_med = measure(EXTRA, EXTRA_RUNS, discard_first=True)
    total = round(sum(timings.values()), 3)
    # The driver records only the LAST 2000 BYTES of stdout (observed:
    # BENCH_r09's "tail" field is a 2000-byte capture whose front —
    # including "value" — was cut once the per-query median map grew
    # the line past that; BENCH_r12/r13 lost the extras block the same
    # way once EXTRA passed ~55 entries). Since round 14 the stdout
    # line carries totals + the 15 HEADLINE mins ONLY — extras NEVER
    # ride the compact line, so it cannot outgrow the cap again
    # (VERDICT r13 #10). Full detail (per-query extras mins + medians)
    # lives in BENCH_DETAIL.json next to this script and on stderr.
    # Per-query calibrated medians (VERDICT r14 #7): one factor, the
    # same rescale the headline's value_calibrated uses, applied to
    # every per-query median so next round's regression triage is one
    # field read per query instead of a manual renormalization.
    cal_factor = round(CAL_REF / calibration, 4) if calibration > 0 else 1.0
    all_med = {**med, **extra_med}
    detail = {
        "queries_min": {**timings, **extra},
        "queries_median": all_med,
        "queries_median_calibrated": {
            n: round(v * cal_factor, 3) for n, v in all_med.items()
        },
        "n_samples": n_samples,
        "warmup_sec": warmup_secs,
        "extra_queries": EXTRA,
        "headline_queries": HEADLINE,
        "calibration_sec": calibration,
        "calibration_ref": CAL_REF,
        "calibration_factor": cal_factor,
        "extra_runs": EXTRA_RUNS,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w", encoding="utf-8") as f:
        json.dump(detail, f)
    print(f"# per-query medians written to {detail_path}", file=sys.stderr)
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,  # HEADLINE only — extras in BENCH_DETAIL.json
            "median_value": round(sum(med.values()), 3),
            "extra_total": round(sum(extra.values()), 3),
            "extra_median_total": round(sum(extra_med.values()), 3),
            "calibration_sec": calibration,
            "value_calibrated": round(total * CAL_REF / calibration, 3)
            if calibration > 0
            else total,
            "sf": sf_dir,
            "cpus": cpus,
            "runs_per_query": RUNS,
            "agg": "min",
            # extras-regime tag (VERDICT r15 #8): the HEADLINE block
            # (query list, min-of-5, warmup sweep, count() action) is
            # frozen since r1; this records the EXTRAS sampling regime
            # so a future change there is visible in the one-line JSON
            # instead of only in a bench.py diff.
            "extra_runs": EXTRA_RUNS,
            "extras_regime": "discarded-warmup+min-of-N_r15",
        }
    )
    if len(line) + 1 > 2000:  # headline set itself outgrew the capture
        print(f"# stdout line {len(line)} B > 2000, falling back to"
              " totals-only (full map in BENCH_DETAIL.json)", file=sys.stderr)
        obj = json.loads(line)
        obj["queries"] = {}
        line = json.dumps(obj)
    print(line)


if __name__ == "__main__":
    main()
