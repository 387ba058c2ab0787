"""Relational + training-data operators, all expressed as DataFrame plans.

Modules:

- ``joins``      — equi/semi/anti/broadcast joins, point-in-time as-of join,
                   range (band) join, skew-salted join
- ``windows``    — top-n per group, running aggregates, lag/lead,
                   gap-based sessionization
- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard near-dup
- ``similarity`` — brute-force cosine top-k, LSH-bucketed ANN
- ``text``       — tokenization, language id, quality scoring, fingerprints
- ``multimodal`` — binary-column plumbing with stubbed decoders
"""
