"""conflation_spark — a PySpark-native spatial-join + tiling engine.

Reimplements the semantics of OpenStreetMapSpeeds/conflation (reference at
/root/reference, MIT) as an idiomatic Spark DataFrame pipeline:

    documents (interleaved text+media span docs, Iceberg/parquet)
      -> decode GPS spans            (sources.spans)
      -> trace-quality filters       (operators.trace_filter)
      -> tile/cell assignment        (operators.tiling)
      -> candidate edge kNN          (operators.candidates)
      -> HMM-Viterbi map matching    (operators.matching)
      -> per-edge speed derivation   (operators.measurements)
      -> 3-level median rollup       (operators.rollup)
      -> speed-config JSON           (functions.config_build)

Everything is DataFrame/SQL + vectorized Arrow UDFs; no per-row Python.
"""

__version__ = "0.1.0"
