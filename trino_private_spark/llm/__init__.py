"""LLM-data-pipeline operators (north-star extras beyond the reference):

- dedup.py       — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup
- similarity.py  — brute-force cosine top-k; LSH-bucketed approximate NN
- text.py        — language-ID, quality scoring, token counting, fingerprinting
- multimodal.py  — opaque binary columns + typed metadata; pandas-UDF plumbing

All operators are DataFrame transforms (JVM-side expressions wherever
possible) so they inherit Spark's scaling: no driver-side loops, no
row-at-a-time Python. Each docstring states the shuffle profile at 100 TB.
"""
