#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling-efficiency evidence).

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Scaling mode (--scaling): run the flagship extraction pipeline over the
same synthetic docs corpus at two parallelism levels (local[8] vs
local[32] — the sandbox stand-in for N vs 4N executors, BASELINE.md
gate) in separate JVMs, and report docs/sec at both plus efficiency =
throughput(4N) / (4 * throughput(N)).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "kg_mentions",
    "kg_tag_sentence",
    "kg_untag_sentence",
    "kg_parse_tags",
    "kg_preproc_sw",
    "kg_preproc_eb",
    "kg_tokenize",
    "kg_triples_hashpred",
    "kg_canonical_triples",
    "kg_triples_model",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_simhash",
    "text_quality",
    "text_lang_id",
    "doc_fingerprint",
    "emb_cosine_topk",
    "emb_ann_lsh",
    "events_window_agg",
    "events_sessionize",
]


def run_headline(sf_dir: str, cpus: str) -> dict:
    from deepref_spark.queries import REGISTRY
    from deepref_spark.session import get_spark

    spark = get_spark("bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = REGISTRY[name]["spark"]
        t0 = time.time()
        # count() forces the full plan without driver-side collection
        fn(spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
    spark.stop()
    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }


def _scaling_child(cores: int, n_docs: int) -> None:
    """Child entry: time the flagship docs->triples pipeline."""
    from deepref_spark import synth
    from deepref_spark.pipeline import extract_scored, triples_from_scored
    from deepref_spark.session import get_spark

    spark = get_spark(f"scale{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth.generate_docs(spark, n_docs, partitions=128)
    docs = docs.localCheckpoint()  # exclude synthesis from the timing
    t0 = time.time()
    scored = extract_scored(spark, docs)
    n = triples_from_scored(scored, canonicalize=False).count()
    dt = time.time() - t0
    print(json.dumps({"cores": cores, "docs": n_docs, "sec": round(dt, 3),
                      "docs_per_sec": round(n_docs / dt, 2), "triples": n}))
    spark.stop()


def run_scaling(n_docs: int = 4000) -> dict:
    out = {}
    for cores in (8, 32):
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(cores), str(n_docs)],
            capture_output=True, text=True, env=env, cwd=str(Path(__file__).parent),
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        out[cores] = json.loads(line)
    t8, t32 = out[8]["docs_per_sec"], out[32]["docs_per_sec"]
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(t32 / (4 * t8), 4),
        "unit": "ratio",
        "docs_per_sec_8": t8,
        "docs_per_sec_32": t32,
        "docs": n_docs,
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        _scaling_child(int(sys.argv[2]), int(sys.argv[3]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
        print(json.dumps(run_scaling(n)))
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        print(json.dumps(run_headline(sf_dir, cpus)))
