"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference clickstream pipeline
(salmansajidsattar/ClickStreaming_End_to_End_Data_Engineering_Project).

Layout:
    session     - SparkSession factory with scale-oriented defaults
    schema      - declared StructTypes (clickstream event, props JSON)
    sources     - batch/streaming source builders (parquet, json, kafka, file-stream)
    operators   - reusable dataframe operators (windows, sessions, dedup,
                  similarity, text, anomaly)
    plans       - the query registry: name -> (spark, sf_dir) -> DataFrame,
                  plus the DuckDB oracle SQL for each
    streaming   - the four reference streaming pipelines + Sink interface

Everything is DataFrame/SQL-first: logical plans are declared with the
DataFrame API and Catalyst picks the physical strategy. No RDDs; Python
UDFs only where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
