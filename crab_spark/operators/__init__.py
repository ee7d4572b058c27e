"""Large-scale training-data pipeline operators.

Beyond the reference's crawl/parse surface, a 100 TB crawl corpus needs
curation ops. All hot paths are JVM-side built-ins (whole-stage codegen)
unless the math genuinely needs numpy, in which case it's an
Arrow-batched pandas UDF — never per-row Python.

- ``dedup``      exact (hash groupBy), MinHash+LSH, SimHash, n-gram
                 Jaccard verification, embedding-cosine near-dup
- ``similarity`` brute-force cosine top-k; IVF-bucketed scale path
- ``text``       token stats, quality scoring, language-ID heuristic,
                 document fingerprinting
- ``decontam``   within-doc repetition gate, benchmark n-gram
                 decontamination, per-source mixture report
- ``multimodal`` binary media columns: typed metadata + decode plumbing
"""
