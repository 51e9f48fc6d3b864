"""adding_datasets_to_kg_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of the MIDAS reference pipeline
(collaborativebioinformatics/Adding_Datasets_to_KG), re-hosted on Spark.

Layout:
    session      — tuned SparkSession factory (AQE, Arrow, adaptive skew join)
    icetable     — Iceberg-style partitioned-Parquet table layout + manifest
    datagen      — deterministic synthetic transcript / lexicon fixtures
    functions    — pure column-expression libraries (text, curie, vectors)
    operators    — mention detection, linking, canonicalization (CC), merge,
                   dedup (exact/minhash/simhash/jaccard/embedding), similarity,
                   stats, multimodal plumbing
    sources      — CIViC / cBioPortal / 1000G-VEP readers + KGX & typed-CSV sinks
    plans        — the end-to-end transcript→triple pipeline + query library
    streaming    — incremental (Trigger.AvailableNow) variant of the pipeline
"""

__version__ = "0.1.0"
