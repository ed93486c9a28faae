"""PySpark-native analytics/ETL engine with the capability surface of the
reference logistics telemetry pipeline (Syedkhalid123/Project-1-greentech-
logistics-data-pipeline), re-expressed Spark-first and extended with a full
relational operator surface plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Layout:
  session.py    -- SparkSession construction / runtime tuning
  schemas.py    -- canonical schemas (telemetry + testdata)
  sources/      -- readers & writers (parquet default, json, pluggable delta)
  pipeline.py   -- reference-parity batch pipeline (parse/validate/split/lineage)
  operators/    -- the declared query surface (relational, dedup, similarity,
                   text, multimodal)
  functions/    -- scalar/vector helpers (cosine, shingles, hashes)
  streaming/    -- Structured Streaming jobs (file source, foreachBatch)
  plans/        -- plan-inspection utilities (explain audits)
  registry.py   -- name -> (spark_fn, oracle_sql) for the driver contract
"""

__version__ = "0.1.0"
