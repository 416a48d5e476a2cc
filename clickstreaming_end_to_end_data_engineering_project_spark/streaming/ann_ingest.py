"""Streaming ANN index ingestion — the live half of the segmented
written-vector layouts in operators/similarity.py, completing the
ingest-twin pattern (near_dedup → MinHash-LSH bands, sketch_ingest →
HLL rollups, bm25_ingest → inverted index, this module → the vector
indexes):

- ``LshIngestSink``: each micro-batch of vectors becomes one
  ``batch=<id>`` segment of a ``write_lsh_index`` layout.  Hyperplanes
  are content-deterministic (xxhash64 seeds, nothing trained), so the
  sink can BOOTSTRAP the index from its first micro-batch and the
  streamed index is bit-identical to a batch build over the same
  vectors — pinned by test.
- ``IvfIngestSink``: requires a PRE-TRAINED ``write_ivf_index`` layout
  (centroids are learned — a stream cannot train them before seeing
  data); each micro-batch is assigned to the stored centroids and
  appended as one segment (Faiss's add-after-train model).  Probe
  exactness over probed clusters is unconditional; recall at serving
  nprobe drifts only as far as the streamed data drifts from the
  training sample — retraining is a rebuild, exactly as in batch.
- ``PqIngestSink`` / ``IvfpqIngestSink`` (r14, with the batch appends
  they wrap): pre-trained layouts required for the same reason
  (codebooks — and for IVFPQ the coarse centroids — are trained
  state); each micro-batch is encoded against the STORED codebooks
  into one ``codes/batch=<id>`` segment.  A streamed PQ index equals
  a same-codebook batch build bit-for-bit (encoding is deterministic
  given the codebooks); IVFPQ additionally inherits the IVF recall
  caveat under distribution drift.

All sinks inherit replay idempotence from the explicit ``batch_id``
overwrite semantics of ``append_*_index``: a re-delivered micro-batch
rewrites its own segment's directories, so crashed or replayed
batches can never double-insert a vector.  Compaction must NOT run
from inside a live stream's cadence — see
operators/maintenance.maintain_index for the replay-wedge analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class LshIngestSink:
    """foreachBatch callable: micro-batch of (id, vector) rows → one
    LSH index segment (bootstraps the layout on the first batch)."""

    def __init__(
        self,
        index_dir: str,
        planes: int = 4,
        dims: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.index_dir = index_dir
        self.planes = planes
        self.dims = dims
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from ..fsutil import existing_batch_ids
        from ..operators.similarity import _write_lsh_segment, append_lsh_index

        if not existing_batch_ids(batch.sparkSession, self.index_dir):
            # bootstrap: geometry from the sink (laid down as the
            # _lsh_params sidecar; later segments read it back so it
            # can never drift).  The first segment is written under
            # THIS batch's id so a replay of it overwrites the same
            # directories.
            _write_lsh_segment(
                batch,
                self.index_dir,
                batch_id,
                self.planes,
                self.dims,
                self.id_col,
                self.vec_col,
                write_params=True,
            )
            return
        append_lsh_index(
            batch,
            self.index_dir,
            id_col=self.id_col,
            vec_col=self.vec_col,
            batch_id=batch_id,
        )


class IvfIngestSink:
    """foreachBatch callable: micro-batch of (id, vector) rows → one
    segment of a PRE-TRAINED IVF layout (raises if the index does not
    exist — train first with ``write_ivf_index``)."""

    def __init__(
        self,
        index_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.index_dir = index_dir
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from ..operators.similarity import append_ivf_index

        append_ivf_index(
            batch,
            self.index_dir,
            id_col=self.id_col,
            vec_col=self.vec_col,
            batch_id=batch_id,
        )


class PqIngestSink:
    """foreachBatch callable: micro-batch of (id, vector) rows → one
    ``codes/batch=<id>`` segment of a PRE-TRAINED PQ layout (raises if
    the index does not exist — train first with ``write_pq_index``).
    Encoding against stored codebooks is deterministic, so the
    streamed index equals a same-codebook batch build bit-for-bit."""

    def __init__(
        self,
        index_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.index_dir = index_dir
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from ..operators.similarity import append_pq_index

        append_pq_index(
            batch,
            self.index_dir,
            id_col=self.id_col,
            vec_col=self.vec_col,
            batch_id=batch_id,
        )


class IvfpqIngestSink:
    """foreachBatch callable: micro-batch of (id, vector) rows → one
    ``codes/batch=<id>/cluster=<c>/`` segment of a PRE-TRAINED IVFPQ
    layout (raises if the index does not exist — train first with
    ``write_ivfpq_index``).  Assignment to stored coarse centroids +
    residual encoding against stored codebooks — the streaming face of
    ``append_ivfpq_index``'s add-after-train contract."""

    def __init__(
        self,
        index_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.index_dir = index_dir
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from ..operators.similarity import append_ivfpq_index

        append_ivfpq_index(
            batch,
            self.index_dir,
            id_col=self.id_col,
            vec_col=self.vec_col,
            batch_id=batch_id,
        )
