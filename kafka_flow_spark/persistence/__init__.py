"""Persistence modes for per-key state (SURVEY.md §7 Phase 2).

The reference offers three interchangeable backends behind one interface
(core/.../persistence/Persistence.scala): Cassandra tables (keys/journal/
snapshot), a compacted Kafka topic, and in-memory.  Spark-first, the default
backend is the streaming checkpoint + state store (zero user code); these
modules add the *explicit* externalized forms for interop and batch recovery:

- snapshots: append-only snapshot log with last-write-wins + tombstone
  compaction — the compacted-Kafka-topic model (#34) on any storage.
- journal: append-only per-key event log + batch re-fold recovery
  (ReadState, Persistence.scala:178-192).
- compression: the reference's size-thresholded compression envelope
  (Compressor.scala:27-96) for state blobs.
- registry: live state introspection via Spark's state-store reader
  (EntityRegistry analog, core/.../registry/EntityRegistry.scala:23-121).
"""
