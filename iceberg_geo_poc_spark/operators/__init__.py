"""Large-scale data-pipeline operators (SURVEY.md §2.12 north-star set).

These have no counterpart in the reference repo (wherobots/iceberg-geo-poc
is a table format); they are the driver-mandated LLM-data-pipeline surface
built Spark-first on the same principles as the table layer: JVM-side
expressions only in hot paths, pandas UDFs only at genuine Python
boundaries (multimodal decode), shuffle-minimal join strategies
(inverted index, LSH banding, IVF partition blocking).
"""
