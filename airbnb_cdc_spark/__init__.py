"""airbnb_cdc_spark — a PySpark-native CDC analytics engine.

Re-implements, Spark-first, the semantics of the reference ADF project
``amber-asad25/AirBnB_CDC_Data_Ingestion_Project`` (see SURVEY.md):

- file-based SCD1 dimension upsert (``pipeline/New_LoadCustomerDim.json``)
- change-feed CDC fact merge (``dataflow/New_BookingTransformation.json``)
- post-load 17-measure aggregation (``sql_queries/synapse_table_creation.sql``)

plus the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB pipeline needs.

Everything is expressed as DataFrame -> DataFrame functions so Catalyst
owns optimization (pushdown, pruning, join selection, AQE) and the same
transform bodies serve both batch and Structured Streaming foreachBatch.
"""

from airbnb_cdc_spark.session import get_spark, load_table

__all__ = ["get_spark", "load_table"]
