"""go_crawler_spark — a PySpark-native web-crawl analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``Ahmed-Sermani/go-crawler`` (a Go goroutine-pipeline crawler with a
CockroachDB link graph, bleve/ES text index, and a BSP PageRank engine)
as an idiomatic Spark lakehouse job:

* crawl pipeline   -> iterative DataFrame BFS over snapshot tables
                      (``go_crawler_spark.crawl``)
* link/text extract-> vectorized Arrow/pandas UDFs, byte-identical to the
                      reference's regex + bluemonday-StrictPolicy semantics
                      (``go_crawler_spark.functions.textops``)
* URL-seen set     -> partitioned Bloom filter + exact anti-join backstop
                      (``go_crawler_spark.operators.seen``)
* politeness/skew  -> salted two-phase per-host top-k
                      (``go_crawler_spark.operators.frontier``)
* link graph       -> snapshot tables with MERGE semantics
                      (``go_crawler_spark.lakehouse``)
* PageRank / SSSP  -> aggregate-messages DataFrame loops
                      (``go_crawler_spark.graphx``)

Everything here is built on public PySpark 4.x APIs only.
"""

__version__ = "0.1.0"
