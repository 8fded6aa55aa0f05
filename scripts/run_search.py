#!/usr/bin/env python
"""Hyperparameter-search entry point — the Spark twin of the
reference's second CLI (`deepref/optimization/bo_optimizer.py:74-92`):
sequential trials over a search space, each trial one full distributed
scoring run, best params reported at the end.

The reference's Optuna study (TPESampler + HyperbandPruner,
bo_optimizer.py:23-27) samples batch_size/lr/max_epoch for TRAINING;
this engine is inference-only, so the searchable knobs are the scoring
pipeline's: encoder, preprocessing variant, max_length, weight seed.
Optuna is used when installed (import-try); otherwise a seeded random
sampler drives the identical trial loop — same trial count, same
objective, deterministic.

Usage:
  spark-submit --py-files deepref_spark.zip scripts/run_search.py \
      --trials 8 --out best.json [--n-docs 120] [--metric macro_f1]
"""

from __future__ import annotations

import argparse
import json

SPACE = {
    "encoder": ["bert", "cnn", "pcnn", "crcnn", "lstm", "gru"],
    "variant": [[], ["sw"], ["d"], ["sw", "d"], ["p"], ["eb"]],
    "max_length": [32, 64, 96, 128],
    "seed": [0, 1, 2],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, default=120)
    ap.add_argument("--docs", default=None)
    ap.add_argument("--metric", default="macro_f1",
                    choices=["acc", "micro_p", "micro_r", "micro_f1", "macro_f1"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from deepref_spark import portable, refsem, synth
    from deepref_spark.operators import convert, parse, preprocess
    from deepref_spark.operators import score as score_op
    from deepref_spark.operators.encoders import score_cnn_family, score_entity
    from deepref_spark.operators.metrics import eval_metrics

    spark = SparkSession.builder.appName("deepref-search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docs = (
        spark.read.parquet(args.docs) if args.docs
        else synth.generate_docs(spark, args.n_docs)
    ).localCheckpoint()
    base_mentions = parse.parse_mentions(convert.text_sentences(docs)).localCheckpoint()
    rel2id = score_op.rel2id_from_relations(portable.RELATION_NAMES)

    def objective(params: dict) -> float:
        mentions = (
            preprocess.apply_variant(base_mentions, params["variant"])
            if params["variant"] else base_mentions
        )
        if params["encoder"] == "bert":
            scored = score_entity(spark, mentions, len(rel2id),
                                  max_length=params["max_length"], seed=params["seed"])
        else:
            scored = score_cnn_family(spark, mentions, len(rel2id),
                                      encoder=params["encoder"],
                                      max_length=params["max_length"], seed=params["seed"])
        scored = score_op.attach_pred_names(scored, rel2id)
        return float(eval_metrics(scored, all_relations=portable.RELATION_NAMES)
                     .first()[args.metric])

    trials = []
    try:
        import optuna  # noqa: F401 — optional, mirrors bo_optimizer.py:23-27

        def opt_objective(trial):
            params = {
                "encoder": trial.suggest_categorical("encoder", SPACE["encoder"]),
                "variant": SPACE["variant"][
                    trial.suggest_int("variant_idx", 0, len(SPACE["variant"]) - 1)],
                "max_length": trial.suggest_categorical("max_length", SPACE["max_length"]),
                "seed": trial.suggest_categorical("seed", SPACE["seed"]),
            }
            v = objective(params)
            trials.append({**params, args.metric: v})
            return v

        study = optuna.create_study(
            direction="maximize",
            sampler=optuna.samplers.TPESampler(seed=42),
            pruner=optuna.pruners.HyperbandPruner(),
        )
        study.optimize(opt_objective, n_trials=args.trials)
        best = dict(study.best_params)
        # suggest_int stores the INDEX; resolve it to the actual variant
        best["variant"] = SPACE["variant"][best.pop("variant_idx")]
        best[args.metric] = study.best_value
    except ImportError:
        import random

        rnd = random.Random(42)
        best = None
        for t in range(args.trials):
            params = {k: rnd.choice(v) for k, v in SPACE.items()}
            v = objective(params)
            rec = {**params, args.metric: v}
            trials.append(rec)
            print(f"TRIAL {t}: {rec}")
            if best is None or v > best[args.metric]:
                best = rec

    with open(args.out, "w") as f:
        json.dump({"best": {**best, "variant": refsem.variant_key(best["variant"])
                            if isinstance(best.get("variant"), list) else best.get("variant")},
                   "trials": len(trials), "metric": args.metric}, f, indent=1, default=str)
    print(f"SEARCH_BEST={json.dumps(best, default=str)}")
    spark.stop()


if __name__ == "__main__":
    main()
