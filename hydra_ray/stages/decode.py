"""The receive→transform stage: vectorized audio decode + validation.

Reference parity: the per-record JSON→Avro conversion + validation +
error-routing pipeline
(`avro/.../JsonConverter.java:120-231`,
`avro/.../convert/StringToGenericRecord.scala:28-51`,
`KafkaClientAlgebra.scala:204-215` record-size limit,
`KafkaClientAlgebra.scala:354-400` deserialization-error router,
`ingestors/kafka/.../ingestors/IngestionErrorHandler.scala:22-91` DLQ)
re-expressed as ONE vectorized Arrow batch kernel:

  bytes + codec + sr_hz  →  pcm: large_list<float32> | decode_error: string

``AudioDecoder`` is a callable class so ``map_batches(AudioDecoder,
concurrency=N)`` runs it as an actor pool with per-actor setup done once
(the reference memo-caches schemas per JVM, `IngestionFlowV2.scala:46-51`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..audio import decode_batch

__all__ = ["AudioDecoder", "split_dlq", "RECORD_SIZE_UNLIMITED"]

RECORD_SIZE_UNLIMITED = 0


class AudioDecoder:
    """Actor-pool decode stage.

    Parameters
    ----------
    record_size_limit:
        Reject payloads larger than this many bytes (0 = unlimited), like
        the reference's optional ``RecordTooLarge`` gate
        (`KafkaClientAlgebra.scala:204-215`).
    validate:
        When true, rows with null ``clip_id`` / non-positive ``sr_hz`` are
        rejected (strict-validation analogue,
        `StringToGenericRecord.scala:58-85` logical-type checks).
    keep_bytes:
        Drop the raw payload column after decode (the default) so the
        decoded stream is much narrower downstream.
    """

    def __init__(
        self,
        record_size_limit: int = RECORD_SIZE_UNLIMITED,
        validate: bool = True,
        keep_bytes: bool = False,
        materialize_pcm: bool = True,
    ):
        self.record_size_limit = record_size_limit
        self.validate = validate
        self.keep_bytes = keep_bytes
        # materialize_pcm=False: identical validation + n_samples but the
        # pcm column is all-null (no float32 buffer is ever built) — for
        # pipelines that stage the encoded bytes passthrough and have no
        # consumer of decoded samples in-flight (no features/transform/
        # filter).  Bytes-per-clip lever at 100 TB: skips 4 B/sample of
        # allocate+fill+ship per clip.
        self.materialize_pcm = materialize_pcm

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch["bytes"].combine_chunks() if n else batch["bytes"]
        if not self.materialize_pcm:
            n_samp, err = decode_batch(
                payloads, batch["codec"], batch["sr_hz"],
                validate_only=True)
            if self.record_size_limit:
                too_big = pc.greater(
                    pc.binary_length(batch["bytes"]),
                    pa.scalar(self.record_size_limit, pa.int64()),
                )
                err = _merge_errors(err, too_big, "RecordTooLarge")
            if self.validate:
                bad_key = pc.is_null(batch["clip_id"])
                err = _merge_errors(err, bad_key, "null clip_id")
                bad_sr = pc.less_equal(batch["sr_hz"],
                                       pa.scalar(0, pa.int32()))
                err = _merge_errors(err, bad_sr, "non-positive sr_hz")
            out = batch if self.keep_bytes else batch.drop_columns(["bytes"])
            out = out.append_column(
                "pcm", pa.nulls(n, pa.large_list(pa.float32())))
            out = out.append_column("n_samples", n_samp)
            out = out.append_column("decode_error", err)
            return out
        pcm, err = decode_batch(payloads, batch["codec"], batch["sr_hz"])

        if self.record_size_limit:
            too_big = pc.greater(
                pc.binary_length(batch["bytes"]),
                pa.scalar(self.record_size_limit, pa.int64()),
            )
            err = _merge_errors(err, too_big, "RecordTooLarge")
        if self.validate:
            bad_key = pc.is_null(batch["clip_id"])
            err = _merge_errors(err, bad_key, "null clip_id")
            bad_sr = pc.less_equal(batch["sr_hz"], pa.scalar(0, pa.int32()))
            err = _merge_errors(err, bad_sr, "non-positive sr_hz")

        out = batch if self.keep_bytes else batch.drop_columns(["bytes"])
        n_samples = pc.cast(pc.list_value_length(pcm), pa.int32())
        out = out.append_column("pcm", pcm)
        out = out.append_column("n_samples", n_samples)
        out = out.append_column("decode_error", err)
        return out


def _merge_errors(err: pa.Array, mask, label: str) -> pa.Array:
    mask = pc.fill_null(mask, False)
    if not pc.any(mask).as_py():
        return err
    labels = pc.if_else(mask, pa.scalar(label, pa.string()), pa.scalar(None, pa.string()))
    return pc.coalesce(err, labels)


def split_dlq(decoded_ds):
    """Split a decoded Dataset into (main, dlq) on ``decode_error``.

    Both branches stay lazy; each side is a vectorized Arrow filter (the
    reference's `collect { case Right(v) => v }` / error-topic fork,
    `KafkaClientAlgebra.scala:381-400`).
    """
    main = decoded_ds.map_batches(
        lambda t: t.filter(pc.is_null(t["decode_error"])).drop_columns(["decode_error"]),
        batch_format="pyarrow",
    )
    dlq = decoded_ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["decode_error"])).drop_columns(["pcm", "n_samples"]),
        batch_format="pyarrow",
    )
    return main, dlq
