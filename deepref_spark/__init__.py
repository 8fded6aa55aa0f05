"""deepref_spark — a PySpark-native knowledge-graph construction engine.

Re-realizes the capabilities of the DeepREF relation-extraction framework
(reference: igorvlnascimento/DeepREF) as an idiomatic Spark DataFrame
pipeline: triple extraction, entity linking, canonicalization, and graph
materialization over tables of interleaved text+media documents.

This is a from-scratch Spark-first design, NOT a port: the reference's
Python for-loops over sentence lists become DataFrame transforms, its
torch DataLoader becomes Arrow-batched pandas UDF inference with
broadcast weights, and its CSV/txt file stages become checkpointed
partitioned tables.

Package layout:
    refsem.py     pure-Python transcription of the reference's row-level
                  semantics (test oracle; cited file:line per function)
    nlp.py        deterministic rule-based tagger (pluggable backends)
    portable.py   hash/tokenize formulas expressible identically in
                  Spark SQL and DuckDB SQL (drives oracle parity)
    model.py      deterministic numpy stand-in for the BERT forward pass
                  with real broadcast-weight / Arrow-batch plumbing
    synth.py      deterministic synthetic `docs` generator (seed 42)
    operators/    convert, parse, preprocess, tokenize, score, metrics,
                  linking, dedup, text_analysis, similarity, multimodal
    pipeline.py   end-to-end stage graph with checkpoint/resume
"""

__version__ = "0.1.0"
