"""mysql_es_spark — a PySpark-native inverted-index build + BM25 top-k query
engine with the query/data-processing capabilities of fly-studio/mysql-es.

The reference (/root/reference, Java 8) is a MySQL→Elasticsearch fulltext
sync pipeline; this package re-expresses everything it computes — bulk index
build, incremental re-index, parent/child relation joins, checkpoint/lineage,
and the ES-side tokenize+BM25 contract — as idiomatic Spark DataFrame plans:

- ``corpus``      deterministic synthetic transcripts generator (FIXTURES.md)
- ``config``      IndexConfig (k1/b, block size, bucket/salt layout)
                  [analog of setting/River.java]
- ``functions.analyze``   vectorized tokenizer/fold pandas UDFs
                  [analog of etc/template.json analyzers]
- ``functions.codecs``    delta-gap + FOR bit-packed posting block codec
- ``operators.docids``    deterministic dense docid assignment
                  [analog of Record.getID, Record.java:193-205]
- ``operators.postings``  posting-list construction with range-salted shuffle
- ``operators.query``     BM25 top-k (simple DF path + block-max pruned path)
- ``operators.relations`` conv-level parent/child rollup joins
                  [analog of mysql/relation/*.java]
- ``plans.build``         bucket-wave resumable build with lineage + metrics
                  [analog of setting/BinLog.java checkpointing]
- ``operators.dedup / similarity / textstats / multimodal`` — the
  training-data-pipeline operator suite (exact/MinHash/SimHash dedup, ANN,
  language-ID / quality / fingerprinting, binary-column plumbing)
- ``oracle``      pure-NumPy reference BM25 scorer (rank-identity oracle)
"""

__version__ = "0.1.0"
