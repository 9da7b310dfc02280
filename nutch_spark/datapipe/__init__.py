"""LLM-training-data pipeline operators (BASELINE.json north star).

Net-new surface beyond the reference: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard), similarity search over embedding columns, text
analysis (language id, quality scoring, token counting, fingerprinting) and
multimodal column plumbing.  All designed for the 100 TB path: shuffles only
on bucketed/banded keys, no driver-side loops, no cartesian products except
explicitly-bounded candidate sets.
"""
