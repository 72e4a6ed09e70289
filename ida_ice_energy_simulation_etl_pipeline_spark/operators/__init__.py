"""Scale-extension operators beyond the reference's surface.

The reference is a pure batch star-schema ETL (SURVEY.md §2); a 100 TB
training-data pipeline additionally needs deduplication, similarity
search, text analysis, and multimodal-column handling.  Every operator
here is expressed as declarative DataFrame composition (JVM-side,
codegen-able) unless a Pandas UDF is genuinely required (multimodal
decode), and each ships with a DuckDB oracle where SQL can express it.
"""
