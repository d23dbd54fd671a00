"""Engine operators.

* ``table_checks`` — uniqueness (salted two-phase), FK orphans
  (broadcast anti-join), column profiling, quantile drift sketches
* ``dedup`` — exact, MinHash+LSH, SimHash, n-gram Jaccard
* ``similarity`` — brute-force + hyperplane-LSH cosine search, near-dups
* ``text`` — language-ID, quality scoring, token counting, fingerprints
* ``multimodal`` — binary payload decode plumbing + pixel/caption invariants
* ``jsonbatch`` — Arrow-batched validation of schema-flexible JSON
"""

import importlib

__all__ = ["dedup", "jsonbatch", "multimodal", "similarity", "table_checks",
           "text"]


def __getattr__(name):  # lazy: keep executor python-worker cold-start lean
    if name in __all__:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
