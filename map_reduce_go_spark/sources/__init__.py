from map_reduce_go_spark.sources.readers import (
    TABLES,
    corpus_from_documents,
    load_table,
    load_tables,
    read_wholetext,
)

__all__ = [
    "TABLES",
    "corpus_from_documents",
    "load_table",
    "load_tables",
    "read_wholetext",
]
