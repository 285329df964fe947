"""Large-scale training-data-pipeline operators.

Beyond the reference's graph surface: deduplication (exact, MinHash
LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force + bucketed ANN), text analysis (language id, quality
scoring, token stats, fingerprinting), and multimodal binary-column
plumbing.  All built on JVM-side ``pyspark.sql.functions`` except the
explicitly-marked Pandas-UDF paths.
"""
