"""spark-submit entry point: raw documents table -> training-ready corpus.

The composed end-to-end training-data pipeline — the reason the corpus
operators exist as a library: quality gating, language filtering, exact
then near-dup deduplication, and an optional balanced sample, in the order
a real ingest runs them (cheap single-scan filters FIRST so the expensive
dedup shuffles only survivors, exact dedup BEFORE banding so byte-identical
mass never hits the LSH join). Ships like the other jobs:

    spark-submit --master <cluster> \
        --py-files dist/geojson_vt_spark.zip \
        jobs/corpus_pipeline_job.py \
        --documents /path/to/documents.parquet \
        --output /path/to/clean-corpus \
        [--langs en,de] [--min-uniq-ratio 0.3] [--min-chars 100] \
        [--max-dup-bigram-ratio 0.6] [--sample-k 0] \
        [--dedup-threshold 0.5] [--lsh-bucket-cap 1000] \
        [--decontam-eval /path/to/eval.parquet] [--pack-budget 2048]

Input: parquet with (doc_id: bigint, source: string, text: string) at
minimum. Output: the kept (doc_id, source) corpus parquet (plus rank when
--sample-k > 0).

100 TB shape: stages 1-2 (quality + language) are pure Column expressions
folded into ONE corpus scan — no joins, no Python, whole-stage codegen.
Stage 3a (exact dedup) is one fingerprint groupBy keeping the min-doc_id
row per (source, md5(text)) — map-side partial min, so byte-identical
boilerplate collapses BEFORE the expensive near-dup machinery ever sees
it; this is also what keeps the LSH hot-bucket cap honest, because the
mega-buckets the cap would drop are overwhelmingly exact-duplicate
clusters, which never reach the band join. Stage 3b (near-dup) runs
minhash-LSH banding over the exact-deduped survivors (one band-join
shuffle + candidate-only refine; buckets above --lsh-bucket-cap are
dropped — the documented recall trade for bounded skew), connected
components over the pair graph, and a broadcast anti-join of the tiny
drop-list. Stage 4 (sampling) is the hash-prefix pre-filtered stratified
draw (no whole-stratum sorts).

Optional hygiene stages (hygiene.py): --decontam-eval drops docs sharing
any n-gram shingle with an eval-set parquet (stage 2b — broadcast shingle
table + broadcast anti-join, zero corpus shuffle); --pack-budget writes
per-source sequence-packing bin manifests over the kept corpus to
<output>_packs, packing on a token count carried from the stage-1 scan so
the text column is never re-read.

Resumability (--workdir): the expensive stage outputs — near-dup pairs
(the band-join shuffle) and the narrow exact keep-ids — persist as
parquet snapshots, with the stage-count row written LAST as the
completion certificate; a re-submitted job whose workdir certifies skips
stages 1-3b entirely and re-runs only the cheap tail (CC, anti-join,
sample, pack). An options fingerprint refuses to resume snapshots built
under different filters/input (pyramid_job's per-level contract, applied
per stage); sample-k / pack-budget are excluded from the fingerprint by
design — re-submitting with a different sample size REUSES the dedup work.

Prints one PIPELINE_METRICS JSON line: per-stage doc counts (input,
quality-passed, lang-passed, decontam-dropped, exact-kept, near-dup pairs,
clusters, kept, pack bins, sampled), a resumed flag, and wall time — the
per-stage lineage a pipeline operator actually monitors.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True, help="kept-corpus parquet")
    ap.add_argument("--langs", default="en,de,fr",
                    help="comma list of language guesses to keep")
    ap.add_argument("--min-chars", type=int, default=100)
    ap.add_argument("--min-uniq-ratio", type=float, default=0.0,
                    help="drop docs whose distinct-token ratio is below this")
    ap.add_argument("--max-dup-bigram-ratio", type=float, default=None,
                    help="drop docs whose duplicate-bigram fraction exceeds "
                         "this (Gopher-style repetition gate; default off)")
    ap.add_argument("--dedup-threshold", type=float, default=0.5,
                    help="token-set Jaccard threshold for near-dup pairs")
    ap.add_argument("--lsh-bucket-cap", type=int, default=1000,
                    help="drop LSH band buckets larger than this (0 = no "
                         "cap); bounds hot-key skew at a documented recall "
                         "cost — exact duplicates are immune (stage 3a)")
    ap.add_argument("--sample-k", type=int, default=0,
                    help="balanced per-source sample size (0 = keep all)")
    ap.add_argument("--decontam-eval", default=None,
                    help="parquet of eval-set documents (doc_id, text): "
                         "corpus docs sharing any n-gram shingle with them "
                         "are dropped (broadcast filter, zero corpus "
                         "shuffle)")
    ap.add_argument("--decontam-ngram", type=int, default=8,
                    help="shingle width in tokens for --decontam-eval")
    ap.add_argument("--pack-budget", type=int, default=0,
                    help="when > 0, also write per-source sequence-packing "
                         "bin manifests (budget tokens per training "
                         "sequence) to <output>_packs")
    ap.add_argument("--dedup-scope", choices=("source", "global"),
                    default="source",
                    help="'source' (default): byte- and near-duplicates "
                         "collapse within each source only (cross-source "
                         "copies survive); 'global': one corpus-wide dedup "
                         "domain — the exact fingerprint groups without "
                         "source and the LSH band keys drop it")
    ap.add_argument("--workdir", default=None,
                    help="stage-snapshot dir: the expensive stage outputs "
                         "(exact keep-ids, near-dup pairs, stage counts) "
                         "persist here and a re-submitted job resumes past "
                         "them instead of recomputing (pyramid_job's "
                         "per-level contract, applied per stage)")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore any snapshots already in --workdir")
    return ap.parse_args(argv)


# args that change the stage snapshots' content — a workdir built under
# different values must refuse to resume (same contract as pyramid_job's
# options fingerprint). sample-k / pack-budget run AFTER the snapshots and
# are deliberately excluded: re-submitting with a different sample size
# reuses the expensive dedup work, which is the point.
_FP_ARGS = (
    "documents", "langs", "min_chars", "min_uniq_ratio",
    "max_dup_bigram_ratio", "dedup_threshold", "lsh_bucket_cap",
    "decontam_eval", "decontam_ngram", "dedup_scope",
)


def _compute_fingerprint(spark, args) -> dict:
    """Options + input-content fingerprint. The content marker lists every
    input file's (path, size, mtime) through the Hadoop filesystem —
    metadata-only, no data scan — so an in-place refresh is caught even
    when the writer reuses identical part filenames (pyarrow/pandas emit
    deterministic names, unlike Spark's UUIDs). Raises SystemExit with a
    clear message when the input is unreadable (a resume cannot be
    VERIFIED against a vanished input, so it must not proceed silently)."""
    import hashlib
    import json as _json  # noqa: F401 — parity with caller's json use

    fp = {k: getattr(args, k.replace("-", "_")) for k in _FP_ARGS}

    def _file_entries(path: str, flag: str) -> list:
        try:
            files = sorted(spark.read.parquet(path).inputFiles())
            jvm = spark._jvm
            conf = spark._jsc.hadoopConfiguration()
            entries = []
            for f in files:
                p = jvm.org.apache.hadoop.fs.Path(f)
                st = p.getFileSystem(conf).getFileStatus(p)
                entries.append(
                    f"{f}\t{st.getLen()}\t{st.getModificationTime()}"
                )
            return entries
        except Exception as e:  # noqa: BLE001
            raise SystemExit(
                f"corpus_pipeline_job: cannot read {flag} "
                f"({path}: {type(e).__name__}) — the workdir "
                "fingerprint cannot be verified, so neither a fresh run "
                "nor a resume can proceed."
            )

    entries = _file_entries(args.documents, "--documents")
    if args.decontam_eval:
        # the eval set shapes the exact_ids/pairs snapshots too: an
        # in-place refresh (same path, pyarrow's deterministic filenames)
        # must invalidate a resume the same way a --documents refresh does
        entries += _file_entries(args.decontam_eval, "--decontam-eval")
    fp["_input_files"] = hashlib.md5("\n".join(entries).encode()).hexdigest()
    return fp


def _fingerprint_path(workdir: str) -> str:
    return workdir.rstrip("/") + "/_options_fingerprint"


def _read_fingerprint(spark, workdir: str):
    import json as _json

    try:
        return _json.loads(
            spark.read.parquet(_fingerprint_path(workdir)).collect()[0]["fp"]
        )
    except Exception:  # noqa: BLE001 — nothing recorded yet
        return None


def _record_fingerprint(spark, workdir: str, fp: dict) -> None:
    import json as _json

    spark.createDataFrame(
        [(_json.dumps(fp),)], "fp string"
    ).write.mode("overwrite").parquet(_fingerprint_path(workdir))


def main(argv: list[str]) -> None:
    args = parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from geojson_vt_spark.analytics import admission_quality_col
    from geojson_vt_spark.training import lang_cols, minhash_lsh_pairs

    spark = SparkSession.builder.appName(
        "geojson-vt-spark corpus pipeline"
    ).getOrCreate()

    t0 = time.time()
    resume = not args.no_resume
    snap = (
        (lambda name: args.workdir.rstrip("/") + "/" + name)
        if args.workdir
        else None
    )

    # Workdir protocol, crash-safe ordering: (1) verify the fingerprint and
    # look for a certificate; (2) if resuming, serve the snapshots; (3) if
    # computing fresh, INVALIDATE the old certificate FIRST and only then
    # record the new fingerprint. A crash between (3)'s two writes leaves
    # either {old fp + invalid cert} or {new fp + invalid cert} — in both
    # states the next run recomputes; the fatal state {new fp + old
    # complete cert} can never exist on disk.
    meta = None
    if snap:
        fp = _compute_fingerprint(spark, args)
        prev = _read_fingerprint(spark, args.workdir)
        if resume and prev is not None and prev != fp:
            diff = {
                k: (prev.get(k), fp[k]) for k in fp if prev.get(k) != fp[k]
            }
            raise SystemExit(
                "corpus_pipeline_job: --workdir holds stage snapshots built "
                f"under DIFFERENT options/input ({diff}); resuming would mix "
                "corpora. Pass --no-resume or use a new --workdir."
            )
        if resume and prev == fp:
            # stage_counts is written LAST of the three snapshots, so a
            # COMPLETE counts dict certifies exact_ids + pairs. CC and the
            # final anti-join/sample/pack re-run from the snapshots (cheap
            # relative to the band join the snapshots hold).
            try:
                meta = json.loads(
                    spark.read.parquet(snap("stage_counts")).collect()[0]["m"]
                )
            except Exception:  # noqa: BLE001 — nothing snapshotted yet
                meta = None
            if not (isinstance(meta, dict) and "docs_in" in meta):
                meta = None  # incomplete marker — no certificate
        if meta is None:
            spark.createDataFrame(
                [(json.dumps({"_incomplete": True}),)], "m string"
            ).write.mode("overwrite").parquet(snap("stage_counts"))
            _record_fingerprint(spark, args.workdir, fp)

    if meta is not None:
        _finish(
            spark, args, t0,
            exact_ids=spark.read.parquet(snap("exact_ids")),
            pairs=spark.read.parquet(snap("pairs")),
            counts=meta,
            resumed=True,
        )
        return

    docs = spark.read.parquet(args.documents)

    # Stages 1+2 fold into one scan: every signal is a Column expression, so
    # Catalyst plans a single parquet pass with the combined filter pushed
    # as far down as the format allows. The three stage counts (input,
    # quality-passed, lang-passed) come from ONE aggregate over that scan —
    # sums of flag casts — never by materializing the text-bearing corpus
    # (an eager localCheckpoint here would copy the whole input to
    # executor-local storage and be non-replayable on executor loss).
    lc = lang_cols()
    keep_langs = [s.strip() for s in args.langs.split(",") if s.strip()]
    # one shared gate definition with the streaming ingest twin
    # (analytics.admission_quality_col) — parity is structural
    quality_ok = admission_quality_col(
        args.min_chars, args.min_uniq_ratio, args.max_dup_bigram_ratio
    )
    flagged = docs.select(
        "doc_id",
        "source",
        "text",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("_n_tok"),
        quality_ok.alias("_q_ok"),
        lc["guess"].alias("_lang"),
    )
    keep_flag = F.col("_q_ok") & F.col("_lang").isin(keep_langs)
    counts = flagged.agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.col("_q_ok").cast("long")).alias("n_quality"),
        F.sum(keep_flag.cast("long")).alias("n_lang"),
    ).collect()[0]
    # F.sum over zero rows is NULL: the `or 0` keeps an empty input corpus
    # a valid (all-zero) run instead of a TypeError
    n_in = int(counts.n_in or 0)
    n_quality = int(counts.n_quality or 0)
    n_lang = int(counts.n_lang or 0)
    # survivors re-derive lazily from the parquet scan (filter pushdown),
    # so the dedup stage reads only survivors — no corpus checkpoint
    survivors = flagged.where(keep_flag)

    # Stage 2b (optional): test-set decontamination. The contaminated-id
    # set is tiny (eval suites are small), so the drop is a broadcast
    # anti-join — the corpus still never shuffles before exact dedup.
    n_contam = 0
    if args.decontam_eval:
        # contamination_hits, not decontaminate: the audit variant would
        # left-join the hit table back onto a SECOND full corpus scan just
        # for .where('contaminated') to filter it straight back down to the
        # hit set — the drop-list is the hits aggregate itself
        from geojson_vt_spark.hygiene import contamination_hits

        evals = spark.read.parquet(args.decontam_eval)
        contaminated = (
            contamination_hits(survivors, evals, n=args.decontam_ngram)
            .select("doc_id")
            .localCheckpoint(eager=True)  # ids only; reused by count + join
        )
        n_contam = contaminated.count()
        survivors = survivors.join(
            F.broadcast(contaminated), "doc_id", "left_anti"
        )

    # Stage 3a: exact dedup — ONE fingerprint groupBy keeping the whole
    # min-doc_id row per (source, md5(text)). min(struct) compares doc_id
    # first, so the keeper is deterministic, and the partial (map-side) min
    # means each distinct text crosses the shuffle once per input partition
    # at most — the right 100 TB shape. Collapsing byte-identical docs here
    # is what makes the stage-3b bucket cap a recall trade instead of a
    # correctness hole: mega-duplicate clusters are exact dups and never
    # reach the band join.
    exact_keys = (
        ["source"] if args.dedup_scope == "source" else []
    ) + [F.md5(F.col("text")).alias("_fp")]
    exact = (
        survivors.groupBy(*exact_keys)
        .agg(F.min(F.struct("doc_id", "text", "_n_tok", "source")).alias("_r"))
        .select(
            F.col("_r.doc_id").alias("doc_id"),
            F.col("_r.source").alias("source"),
            F.col("_r.text").alias("text"),
            F.col("_r._n_tok").alias("_n_tok"),
        )
    )

    # Stage 3b: near-dup pair mining over the exact-deduped survivors (the
    # expensive stage sees the smallest possible corpus). Banded minhash
    # candidates + exact Jaccard refine. With --workdir, pairs and the
    # narrow exact keep-ids persist as parquet snapshots (lineage cut AND
    # the resume point); otherwise localCheckpoint cuts lineage in-session.
    # under global scope the band join must not key on source: feed the
    # LSH one synthetic domain (the pair output carries ids only, so the
    # real source column is unaffected downstream)
    dedup_source = (
        F.col("source")
        if args.dedup_scope == "source"
        else F.lit("__global__")
    )
    toks = exact.select(
        "doc_id", dedup_source.alias("source"),
        F.array_distinct(F.split(F.col("text"), " ")).alias("toks"),
    )
    pairs = minhash_lsh_pairs(
        toks,
        threshold=args.dedup_threshold,
        bucket_cap=args.lsh_bucket_cap if args.lsh_bucket_cap > 0 else None,
    )
    if snap:
        pairs.write.mode("overwrite").parquet(snap("pairs"))
        pairs = spark.read.parquet(snap("pairs"))
    else:
        pairs = pairs.localCheckpoint(eager=True)
    n_pairs = pairs.count()

    # narrow (doc_id, source, token-count) checkpoint of the exact keepers:
    # text never leaves the executors, and the exact-dedup aggregate runs
    # once for the pair pipeline (above, already checkpointed) and once here
    # — not again for the final anti-join and the stage count
    if snap:
        exact.select("doc_id", "source", "_n_tok").write.mode(
            "overwrite"
        ).parquet(snap("exact_ids"))
        exact_ids = spark.read.parquet(snap("exact_ids"))
    else:
        exact_ids = exact.select("doc_id", "source", "_n_tok").localCheckpoint(
            eager=True
        )
    n_exact = exact_ids.count()

    counts = {
        "docs_in": n_in,
        "quality_passed": n_quality,
        "lang_passed": n_lang,
        "decontam_dropped": n_contam,
        "exact_kept": n_exact,
        "near_dup_pairs": n_pairs,
    }
    if snap:
        # written LAST: its presence certifies the full snapshot set
        spark.createDataFrame([(json.dumps(counts),)], "m string").write.mode(
            "overwrite"
        ).parquet(snap("stage_counts"))
    _finish(spark, args, t0, exact_ids, pairs, counts, resumed=False)


def _output_manifest_path(args) -> str:
    return args.output.rstrip("/") + "_manifest"


def _read_output_manifest(spark, args):
    try:
        m = json.loads(
            spark.read.parquet(_output_manifest_path(args)).collect()[0]["m"]
        )
        return m if isinstance(m, dict) and "fp" in m else None
    except Exception:  # noqa: BLE001 — no manifest yet
        return None


def _write_output_manifest(spark, args, payload: dict) -> None:
    spark.createDataFrame(
        [(json.dumps(payload),)], "m string"
    ).write.mode("overwrite").parquet(_output_manifest_path(args))


def _finish(spark, args, t0, exact_ids, pairs, counts, resumed: bool) -> None:
    """Stages downstream of the snapshots: CC grouping, drop-list anti-join,
    optional sample, output write, optional packing manifests, metrics.

    EXACTLY-ONCE output (r4 verdict item 7): the final docs_out (+ packs)
    writes carry the same certificate discipline as the stage snapshots —
    an <output>_manifest parquet records the full output lineage (input
    content marker + every stage knob INCLUDING the tail-only sample_k /
    pack_budget) and is written LAST, after every output write succeeded.
    A re-submitted job whose manifest certifies the identical lineage
    replays the recorded metrics and touches NOTHING on disk (so a
    completed output can never be clobbered mid-read by an accidental
    resubmit); any run that must recompute INVALIDATES the manifest first,
    so a crash between output and packs writes always leaves an
    incomplete certificate and the next run rewrites both via
    mode=overwrite — never a partial mix of two runs."""
    from pyspark.sql import functions as F

    from geojson_vt_spark.training import connected_components, stratified_sample

    ofp = dict(
        _compute_fingerprint(spark, args),
        sample_k=args.sample_k,
        pack_budget=args.pack_budget,
    )
    if not args.no_resume:
        prev = _read_output_manifest(spark, args)
        if prev is not None and prev["fp"] == ofp:
            try:  # certificate without the goods (deleted output) recomputes
                spark.read.parquet(args.output).schema
                if args.pack_budget > 0:
                    spark.read.parquet(args.output + "_packs").schema
                ok = True
            except Exception:  # noqa: BLE001
                ok = False
            if ok:
                metrics = {
                    **prev["metrics"],
                    "resumed": True,
                    "output_certified": True,
                    "sec": round(time.time() - t0, 3),
                }
                print("PIPELINE_METRICS " + json.dumps(metrics))
                spark.stop()
                return
    # crash-safe ordering: kill the old certificate before any output write
    _write_output_manifest(spark, args, {"_incomplete": True})

    clusters = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    n_clusters = clusters.select("cluster_rep").distinct().count()
    drops = clusters.where(F.col("doc_id") != F.col("cluster_rep")).select(
        "doc_id"
    )
    kept = exact_ids.join(F.broadcast(drops), "doc_id", "left_anti")

    # Stage 4: optional balanced draw per source stratum.
    if args.sample_k > 0:
        out = stratified_sample(kept.drop("_n_tok"), k=args.sample_k)
    else:
        out = kept.drop("_n_tok")
    out.write.mode("overwrite").parquet(args.output)
    n_out = spark.read.parquet(args.output).count()

    # Stage 5 (optional): sequence-packing manifests over the WRITTEN
    # corpus — when --sample-k filtered it, the manifests must describe the
    # sampled doc set, not the pre-sample keep-list (a trainer reads
    # <output> + <output>_packs together). The token counts join back from
    # the narrow exact_ids checkpoint (equi-join, sampled side smaller);
    # the text column never re-enters.
    n_bins = 0
    if args.pack_budget > 0:
        from geojson_vt_spark.hygiene import sequence_pack

        pack_src = (
            kept
            if args.sample_k <= 0
            else out.select("doc_id", "source").join(
                exact_ids, ["doc_id", "source"]
            )
        )
        packs = sequence_pack(
            pack_src, budget=args.pack_budget, n_tokens_col="_n_tok"
        )
        packs.write.mode("overwrite").parquet(args.output + "_packs")
        n_bins = spark.read.parquet(args.output + "_packs").count()

    metrics = {
        **counts,
        "clusters": n_clusters,
        "docs_out": n_out,
        "pack_bins": n_bins,
        "sample_k": args.sample_k,
        "resumed": resumed,
        "sec": round(time.time() - t0, 3),
    }
    # written LAST: certifies docs_out AND the packs manifests
    stored = {k: v for k, v in metrics.items() if k not in ("resumed", "sec")}
    _write_output_manifest(spark, args, {"fp": ofp, "metrics": stored})
    print("PIPELINE_METRICS " + json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
