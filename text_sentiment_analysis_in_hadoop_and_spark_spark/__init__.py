"""PySpark-native analytics engine with the query/data-processing
capabilities of Coursal/Text-Sentiment-Analysis-In-Hadoop-And-Spark.

The reference (read-only at /root/reference) implements sentiment
classification over tweets as chained Hadoop MapReduce jobs and Spark
RDD/MLlib programs.  This package re-expresses every operator in that
repo as idiomatic PySpark DataFrame plans (Catalyst-optimizable, no
Python UDFs on hot paths), plus the large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal
plumbing, structured streaming).

Layout
------
- ``session``    SparkSession factory (AQE on, sane shuffle partitions)
- ``sources``    table loaders (parquet), CSV fidelity/correct readers
- ``functions``  pure-Column expression builders (cleaning, text stats,
                 portable hashing)
- ``operators``  relational operators: Naive Bayes train/score, TF-IDF,
                 dedup, similarity, TPC-H-style relational, events
- ``ml``         pyspark.ml Pipeline parity (Tokenizer→HashingTF→IDF→
                 NaiveBayes / LinearSVC)
- ``streaming``  Structured Streaming surface (beyond-reference ext.)
- ``plans``      physical-plan helpers (broadcast, salting, explain)
"""

__version__ = "0.1.0"
