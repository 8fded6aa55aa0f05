#!/usr/bin/env python
"""Ablation-studies entry point — the Spark twin of the reference's
third CLI (`deepref/ablation/ablation_studies.py:58-116`): a
driver-side grid of encoder x preprocessing-variant x seed around the
scoring pipeline, with the reference's incremental-CSV-append +
resume-by-row-count semantics (`ablation_studies.py:42-56,74-75,
144-147`): rerunning after an interruption skips exactly the configs
already in the CSV.

Usage:
  spark-submit --py-files deepref_spark.zip scripts/run_ablation.py \
      --out abl.csv [--n-docs 120] [--encoders bert,cnn,...]
      [--variants original,sw,d,...|all48] [--seeds 3]

The grid loop is driver-side by design (SURVEY.md §3.3: "it does not
shape the engine") — each config is one distributed scoring job.
"""

from __future__ import annotations

import argparse
import csv
import os


def grid(encoders: list[str], variants: list[list[str]], n_seeds: int):
    for enc in encoders:
        for var in variants:
            for seed in range(n_seeds):
                yield enc, var, seed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, default=120)
    ap.add_argument("--docs", default=None)
    ap.add_argument("--encoders", default="bert,cnn,pcnn,crcnn,lstm,gru")
    ap.add_argument("--variants", default="original,sw,d,p,eb")
    ap.add_argument("--seeds", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from deepref_spark import portable, refsem, synth
    from deepref_spark.operators import convert, parse, preprocess
    from deepref_spark.operators import score as score_op
    from deepref_spark.operators.encoders import score_cnn_family, score_entity
    from deepref_spark.operators.metrics import eval_metrics

    spark = SparkSession.builder.appName("deepref-ablation").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.variants == "all48":
        variants = refsem.all_preproc_combinations()
    else:
        variants = [
            [] if v == "original" else v.split("+")
            for v in args.variants.split(",") if v
        ]
    encoders = [e for e in args.encoders.split(",") if e]
    configs = list(grid(encoders, variants, args.seeds))

    # resume-by-row-count (ablation_studies.py:42-56): one CSV data row
    # per completed config, in grid order. The existing rows' config
    # columns must match the current grid prefix — resuming with a
    # DIFFERENT grid would silently mislabel configs otherwise.
    done = 0
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = [ln.split(",")[:3] for ln in f.read().strip().splitlines()[1:]]
        done = len(existing)
        if done > len(configs):
            # a shrunken grid would zip-truncate silently and report
            # stale rows from the old grid as current-grid results
            raise SystemExit(
                f"resume mismatch: CSV has {done} data rows but the current "
                f"grid has only {len(configs)} configs — the grid shrank "
                f"since the interrupted run"
            )
        from deepref_spark import refsem as _rs

        for row, cfg in zip(existing, configs[:done]):
            want = [cfg[0], _rs.variant_key(cfg[1]), str(cfg[2])]
            if row != want:
                raise SystemExit(
                    f"resume mismatch: CSV row {row} != grid config {want} — "
                    f"the grid flags changed since the interrupted run"
                )
    todo = configs[done:]
    print(f"ABLATION configs={len(configs)} done={done} todo={len(todo)}")

    docs = (
        spark.read.parquet(args.docs) if args.docs
        else synth.generate_docs(spark, args.n_docs)
    ).localCheckpoint()
    base_mentions = parse.parse_mentions(convert.text_sentences(docs)).localCheckpoint()
    rel2id = score_op.rel2id_from_relations(portable.RELATION_NAMES)

    header = ["encoder", "variant", "seed", "acc", "micro_p", "micro_r", "micro_f1", "macro_f1"]
    mode = "a" if done else "w"
    with open(args.out, mode, newline="") as f:
        w = csv.writer(f)
        if not done:
            w.writerow(header)
        for enc, var, seed in todo:
            mentions = preprocess.apply_variant(base_mentions, var) if var else base_mentions
            if enc == "bert":
                scored = score_entity(spark, mentions, n_relations=len(rel2id), seed=seed)
            else:
                scored = score_cnn_family(spark, mentions, len(rel2id), encoder=enc, seed=seed)
            scored = score_op.attach_pred_names(scored, rel2id)
            row = eval_metrics(scored, all_relations=portable.RELATION_NAMES).first()
            w.writerow([
                enc, refsem.variant_key(var), seed,
                *(round(row[c], 6) for c in ("acc", "micro_p", "micro_r", "micro_f1", "macro_f1")),
            ])
            f.flush()  # incremental append = the resume point
    print("ABLATION_DONE")
    spark.stop()


if __name__ == "__main__":
    main()
