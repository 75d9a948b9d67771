"""North-star operators for large-scale training-data pipelines.

text_analysis  token stats, language ID, quality score, fingerprint
dedup          exact / MinHash-LSH / SimHash / n-gram-Jaccard near-dup
simsearch      embedding cosine k-NN: brute-force, LSH- and IVF-pruned
pq             product-quantization ANN: sampled Lloyd codebooks, Arrow
               encode, JVM table-lookup ADC scoring + exact rerank
quality_model  learned quality filter: hashed-BoW logistic regression
               (GPT-3/CCNet pattern) + deterministic Pareto keep rule
ann_index      warehouse-managed IVF-PQ index: coarse lists as hive
               partitions (static pruning), codebooks in atomic meta
wordpiece      WordPiece trainer (likelihood-ratio merges, ## pieces)
               + greedy longest-match encoder — the BERT tokenizer
corpus_pipeline  spec-driven stage composition over the library:
               strict up-front validation, one lazy DAG, audit mode
multimodal     opaque binary media columns + Arrow-batched decode stubs
asof           point-in-time join (union + running-last, one shuffle)
rangejoin      interval containment join (bucketed equi-join, no NLJ)
kmeans         Lloyd's centroid training (broadcast assign, exact means)
funnel         ordered-funnel progression (dependent sequential min-agg)
timeseries     fixed-grid resample + forward fill (sequence + as-of join)
scd            SCD Type-2 history from a change stream (one shared shuffle)
sketches       mergeable HLL distinct-count + histogram-quantile state
kll            bounds-free KLL quantile sketch with error certificate
ordering       distributed zipWithIndex / epoch-deterministic shuffle index
skewjoin       salted equi-join for unbroadcastable hot-key joins

All hot-path math is built from ``pyspark.sql.functions`` expressions
(JVM-side, whole-stage codegen); Python appears only in the multimodal
decode stubs (Arrow-batched ``mapInPandas``), mirroring how a real
image/audio decoder would slot in.
"""
