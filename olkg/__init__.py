"""olkg — a PySpark-native knowledge-graph construction engine.

Re-expresses the semantics of rsinger/OpenLibraryDataConverter (a single-pass
Ruby dump→RDF converter with a Redis side channel) as an idiomatic Spark
pipeline: vectorized triple extraction → shuffle/broadcast entity linking →
canonicalization → graph materialization, designed for Common-Crawl-scale
page tables.
"""

__version__ = "0.1.0"
