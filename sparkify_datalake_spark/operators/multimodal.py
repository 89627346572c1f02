"""Multimodal-column operators: opaque binary payloads + typed metadata.

The engine's model for image/audio/video at 100 TB: a ``binary`` payload
column plus a typed metadata struct, processed by Arrow-batched
``mapInPandas`` kernels. The fixtures carry no media files, so payloads
are synthesized: most operators wrap the UTF-8 encoding of
``documents.text``, and ``mm_decode_features`` goes further — it writes
a genuine RIFF/WAV container per document and then REALLY decodes it
(stdlib ``wave`` parse, PCM feature extraction), so the decode tier is
exercised end-to-end, not simulated (round-8 upgrade; only image
decode remains payload-gated on libs absent from the container).

Scale notes (100 TB): media payloads dominate row size — keep them in
their own column so column pruning skips them unless the kernel needs
bytes; process with ``mapInPandas`` (streaming Arrow batches, bounded
memory) rather than collect-style UDFs; repartition by size-balanced
ranges before decode so one 4K video doesn't skew a task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata struct."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
            F.col("n_chars").cast("int").alias("n_chars"),
        ).alias("meta"),
    )


@query(
    "mm_binary_meta",
    """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  n_chars,
  octet_length(encode(text)) = n_chars AS is_ascii,
  md5(text) AS payload_md5
FROM documents
""",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata: byte length, ascii check, content digest."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
        "n_chars",
        (
            F.octet_length(F.encode(F.col("text"), "UTF-8"))
            == F.col("n_chars")
        ).alias("is_ascii"),
        F.md5("text").alias("payload_md5"),
    )


_DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, sample_rate int, n_channels int, "
    "n_frames bigint, duration_ms double, rms double, peak int, "
    "decode_status string"
)

# WAV synthesis parameters shared by the encoder kernel and the
# pure-Python twin in tests/test_multimodal_decode.py
_WAV_RATE = 8000


def wav_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload) frame of genuine RIFF/WAV containers — the
    shared synth stage for the audio-tier operators (the fixtures
    carry no media files): stdlib ``wave`` writer, 16-bit mono PCM at
    _WAV_RATE whose samples expand deterministically from the text
    bytes. One streaming Arrow mapInPandas pass; the kernel is a
    self-contained closure (§7.3 foreign-cwd pickling)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def encode_wav(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import io
        import wave as _wave

        import numpy as _np

        rate = 8000  # keep in sync with _WAV_RATE (closure-local: §7.3)

        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = _np.frombuffer(
                    text.encode("utf-8"), dtype=_np.uint8
                )
                pcm = (
                    (raw.astype(_np.int16) - 128) * 256
                ).astype("<i2")
                buf = io.BytesIO()
                with _wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(pcm.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.mapInPandas(encode_wav, "doc_id bigint, payload binary")


@query("mm_decode_features")
def mm_decode_features(
    spark: SparkSession, sf_dir: str, payloads: DataFrame | None = None
) -> DataFrame:
    """REAL media decode over binary payloads via mapInPandas — the
    audio tier of the multimodal column model.

    The fixtures carry no media files, so a first map stage
    SYNTHESIZES a genuine RIFF/WAV container per document (stdlib
    ``wave`` writer: 16-bit mono PCM at 8 kHz whose samples expand
    deterministically from the text bytes) — and the decode kernel
    then does real work: parses the RIFF chunk structure with
    ``wave``, reads the PCM frame stream, and emits sample_rate /
    channel count / frame count / duration / RMS / peak amplitude
    from the DECODED int16 samples. A payload that fails to parse is
    quarantined in-row (decode_status='corrupt', zeroed features)
    instead of killing the task — the 100 TB posture where one
    truncated object in a billion must not fail the job.

    Rows-only (binary codec round-trip has no SQL twin);
    tests/test_multimodal_decode.py recomputes the whole
    encode→decode→features path in plain Python to 1e-6 and feeds the
    kernel a corrupt payload. Swap the synth stage for `spark.read.
    format("binaryFile")` and this is the production audio-feature
    pipeline unchanged.

    Scale shape: both stages are streaming Arrow-batched mapInPandas
    (bounded memory per batch); payload bytes stay columnar until the
    kernel, and column pruning drops them for any consumer that only
    reads the features.

    ``payloads`` (a (doc_id, payload) frame) overrides the synth stage
    — the production entry point (binaryFile scans plug in here) and
    how tests drive the corrupt branch with real garbage bytes.
    """
    wavs = (
        payloads
        if payloads is not None
        else wav_payloads(spark, sf_dir)
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as _wave

        import numpy as _np

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "n_bytes": [],
                "sample_rate": [],
                "n_channels": [],
                "n_frames": [],
                "duration_ms": [],
                "rms": [],
                "peak": [],
                "decode_status": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(payload)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(blob))
                try:
                    with _wave.open(io.BytesIO(blob), "rb") as w:
                        sr = w.getframerate()
                        nch = w.getnchannels()
                        nf = w.getnframes()
                        pcm = w.readframes(nf)
                    x = _np.frombuffer(pcm, dtype="<i2").astype(
                        _np.float64
                    )
                    out["sample_rate"].append(sr)
                    out["n_channels"].append(nch)
                    out["n_frames"].append(nf)
                    out["duration_ms"].append(
                        round(nf / sr * 1000.0, 3)
                    )
                    out["rms"].append(
                        round(float(_np.sqrt((x * x).mean())), 4)
                        if len(x)
                        else 0.0
                    )
                    out["peak"].append(
                        int(_np.abs(x).max()) if len(x) else 0
                    )
                    out["decode_status"].append("ok")
                except Exception:
                    out["sample_rate"].append(0)
                    out["n_channels"].append(0)
                    out["n_frames"].append(0)
                    out["duration_ms"].append(0.0)
                    out["rms"].append(0.0)
                    out["peak"].append(0)
                    out["decode_status"].append("corrupt")
            yield pd.DataFrame(out)

    return wavs.mapInPandas(decode, _DECODE_SCHEMA)


@query("mm_frame_sample")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling kernel: every k-th fixed-size chunk of the payload.

    Stands in for video frame extraction: one input row fans out to many
    (frame_idx, frame_digest) rows. Rows-only (content digests have no
    SQL oracle); demonstrates the 1→N mapInPandas fan-out shape with
    bounded per-batch memory.
    """
    payloads = with_payload(load(spark, sf_dir, "documents"))
    chunk, stride = 64, 4  # 64-byte "frames", sample every 4th

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_bytes": [],
                "frame_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = [
                    payload[i : i + chunk]
                    for i in range(0, len(payload), chunk)
                ]
                for idx in range(0, len(frames), stride):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(frames[idx]))
                    out["frame_md5"].append(
                        hashlib.md5(frames[idx]).hexdigest()
                    )
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        sample, "doc_id bigint, frame_idx int, frame_bytes int, frame_md5 string"
    )


@query(
    "mm_resize",
    """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes_in,
  least(octet_length(encode(text)), 256) AS n_bytes_out,
  md5(CASE WHEN octet_length(encode(text)) <= 256 THEN text
           ELSE substring(text, 1, 256) END) AS resized_md5
FROM documents
""",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample kernel: cap each payload at a byte budget.

    Stands in for image resize / audio downsample: a 1→1 mapInPandas
    kernel that shrinks the payload and reports old/new sizes plus the
    digest of the resized content. The "resize" is a deterministic
    truncation stub (no media libs in the container); hash-checked
    because truncation IS expressible in SQL — which pins the batch
    plumbing end-to-end, unlike the rows-only stubs.

    Scale note: resize is compute-heavy and 1→1 — the ideal mapInPandas
    shape (no shuffle, Arrow-batched, whole-stage pipelined with the
    scan); output payloads are smaller than inputs so the stage shrinks
    data volume for everything downstream.
    """
    payloads = with_payload(load(spark, sf_dir, "documents"))
    budget = 256

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [p[:budget] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes_in": [len(p) for p in pdf["payload"]],
                    "n_bytes_out": [len(r) for r in resized],
                    "resized_md5": [
                        hashlib.md5(r).hexdigest() for r in resized
                    ],
                }
            )

    return payloads.mapInPandas(
        resize,
        "doc_id bigint, n_bytes_in int, n_bytes_out int, resized_md5 string",
    )


_PHASH_BANDS = 4
_PHASH_BAND_BITS = 16
_PHASH_MAX_HAMMING = 8
_PHASH_MAX_BUCKET = 50


def phash_signatures(payloads: DataFrame) -> DataFrame:
    """(doc_id, phash): 64-bit perceptual-style signature per binary
    payload via an Arrow-batched mapInPandas kernel.

    The media decode is stubbed (no codec libs in the container) with a
    deterministic LOCALITY-PRESERVING reduction — the payload is split
    into 64 byte segments and bit i is set iff segment i's mean exceeds
    the whole payload's mean, so small payload edits flip few bits,
    exactly the property a real pHash/aHash has after decode+DCT. The
    Spark-side contract (binary column in, packed signed-64 hash out,
    bounded Arrow batches, no shuffle) is the real plumbing a production
    image-dedup kernel drops into.
    """
    import numpy as np  # noqa: F401 (kernel captures by value)

    def kernel(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            hashes = []
            for payload in pdf["payload"]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.float64
                )
                if len(b) == 0:
                    hashes.append(0)
                    continue
                # segment means via one cumsum (vectorized; no 64-way
                # array_split allocation per payload)
                idx = (np.arange(65) * len(b)) // 64
                cs = np.concatenate(([0.0], np.cumsum(b)))
                cnt = np.diff(idx)
                sums = cs[idx[1:]] - cs[idx[:-1]]
                means = np.where(cnt > 0, sums / np.maximum(cnt, 1), 0.0)
                bits = means > b.mean()
                h = int.from_bytes(np.packbits(bits).tobytes(), "big")
                if h >= 1 << 63:
                    h -= 1 << 64
                hashes.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})

    return payloads.select("doc_id", "payload").mapInPandas(
        kernel, "doc_id long, phash long"
    )


def phash_dedup_pairs(
    payloads: DataFrame,
    max_hamming: int = _PHASH_MAX_HAMMING,
    max_bucket: int = _PHASH_MAX_BUCKET,
) -> DataFrame:
    """Near-duplicate binary payloads by perceptual-hash hamming
    distance: (doc_a, doc_b, hamming ≤ max_hamming).

    The banding trick from dedup_simhash applied to the multimodal
    signature: 4 bands × 16 bits — two hashes within hamming 8 of each
    other agree exactly on ≥1 band for hamming ≤ 3 and with high
    probability beyond, so candidates come from equality joins on
    (band, band_value), never an all-pairs scan. Verification is one
    codegen expression: bit_count(xor) on the packed longs. Mega-bucket
    cap as in every LSH pipeline here (a degenerate band value shared
    corpus-wide would make candidates quadratic). Scale: one narrow
    kernel pass + one 4×-fanout equality-join shuffle on 10-byte keys +
    per-candidate popcount — the standard web-scale image-dedup shape.
    """
    # materialized once: the self-join references the band frame on BOTH
    # sides and the bucket-count guard a third time — without this the
    # Python signature kernel re-runs per consumer (measured 3×)
    sig = phash_signatures(payloads).localCheckpoint(eager=False)
    bands = sig.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(
                            F.col("phash"), b * _PHASH_BAND_BITS
                        )
                        .bitwiseAND(F.lit((1 << _PHASH_BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for b in range(_PHASH_BANDS)
                ]
            ).alias("bands")
        ).alias("bv"),
    ).select("doc_id", "phash", "bv.band", "bv.band_val")
    small = (
        bands.groupBy("band", "band_val")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= max_bucket)
        .select("band", "band_val")
    )
    bands = bands.join(F.broadcast(small), ["band", "band_val"])
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(
        F.col("a.phash").bitwiseXOR(F.col("b.phash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


@query("mm_dedup_phash")
def mm_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs over the documents' binary
    payloads (rows-only: the signature kernel has no SQL twin; pytest
    pins hamming-0 on identical payloads, locality under small edits,
    and band-collision recall — tests/test_phash.py).
    """
    return phash_dedup_pairs(with_payload(load(spark, sf_dir, "documents")))


@query("mm_payload_entropy")
def mm_payload_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source byte-entropy profile of the binary payloads: Shannon
    entropy of the byte histogram (bits/byte, 0–8) — the media-QC
    screen that tells compressed-or-encrypted (≈8) from raw/text
    (≈4–5) from degenerate/zero-filled (≈0) WITHOUT decoding, i.e.
    the binary-column sibling of text_compression_ratio (which pays
    for a zlib pass; entropy is one histogram). On a real media lake
    this is the first triage over petabytes of opaque blobs:
    mislabeled codecs, double-compressed assets and truncated files
    all show up as entropy-band outliers.

    Rows-only by design (DuckDB has no byte-histogram surface);
    correctness rests on the determinism guard plus
    tests/test_text_ops.py recomputing the entropy in plain Python to
    1e-9. Scale shape: one mapInPandas pass (self-contained kernel,
    np.bincount over each payload — CPU-bound, embarrassingly
    parallel), then a partial-aggregatable per-source rollup of
    (count, mean, min, max, low/high-band counts).
    """
    payloads = load(spark, sf_dir, "documents").select(
        "source", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ents = []
            for buf in pdf["payload"]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                if arr.size == 0:
                    ents.append(0.0)
                    continue
                counts = np.bincount(arr, minlength=256)
                p = counts[counts > 0] / arr.size
                ents.append(float(-(p * np.log2(p)).sum()))
            yield pd.DataFrame(
                {"source": pdf["source"], "entropy": ents}
            )

    per_doc = payloads.mapInPandas(kernel, "source string, entropy double")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("entropy"), 6).alias("avg_entropy"),
        F.round(F.min("entropy"), 6).alias("min_entropy"),
        F.round(F.max("entropy"), 6).alias("max_entropy"),
        F.sum(F.when(F.col("entropy") < 3.0, 1).otherwise(0))
        .cast("long")
        .alias("n_degenerate"),
        F.sum(F.when(F.col("entropy") > 7.5, 1).otherwise(0))
        .cast("long")
        .alias("n_compressed_like"),
    )


_SILENCE_FRAME = 80     # 10 ms at 8 kHz
_SILENCE_REL = 0.1      # silent = frame RMS < 10% of the doc's peak


@query("mm_audio_silence")
def mm_audio_silence(
    spark: SparkSession, sf_dir: str, payloads: DataFrame | None = None
) -> DataFrame:
    """Windowed silence detection over the decoded PCM stream — the
    second real-decode audio operator (speech pipelines gate on
    silence fraction before paying for transcription, and trim
    leading/trailing silence before chunking): per document, the
    decoded int16 samples split into 10 ms frames (_SILENCE_FRAME
    samples), a frame is silent when its RMS falls below _SILENCE_REL
    of the document's peak amplitude, and the row reports frame count,
    silent fraction, the longest silent run (the cut-point signal),
    and whether the doc leads with silence.

    Rows-only (codec round-trip, no SQL twin);
    tests/test_multimodal_decode.py recomputes frames/RMS/runs in
    plain Python. Same two-stage Arrow shape as mm_decode_features,
    same ``payloads`` injection point for production binaryFile scans;
    corrupt payloads quarantine in-row (status='corrupt').
    """
    wavs = (
        payloads
        if payloads is not None
        else wav_payloads(spark, sf_dir)
    )

    def silence(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as _wave

        import numpy as _np

        frame_n, rel = 80, 0.1  # keep in sync with module constants

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "n_frames": [],
                "n_silent": [],
                "silence_frac": [],
                "max_silent_run": [],
                "leads_with_silence": [],
                "status": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    with _wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                        x = _np.frombuffer(
                            w.readframes(w.getnframes()), dtype="<i2"
                        ).astype(_np.float64)
                    n_f = len(x) // frame_n
                    frames = x[: n_f * frame_n].reshape(n_f, frame_n)
                    rms = _np.sqrt((frames * frames).mean(axis=1))
                    peak = _np.abs(x).max() if len(x) else 0.0
                    sil = rms < rel * peak
                    runs, cur = [], 0
                    for s in sil:
                        cur = cur + 1 if s else 0
                        runs.append(cur)
                    out["n_frames"].append(n_f)
                    out["n_silent"].append(int(sil.sum()))
                    out["silence_frac"].append(
                        round(float(sil.mean()), 4) if n_f else 0.0
                    )
                    out["max_silent_run"].append(
                        max(runs) if runs else 0
                    )
                    out["leads_with_silence"].append(
                        bool(sil[0]) if n_f else False
                    )
                    out["status"].append("ok")
                except Exception:
                    out["n_frames"].append(0)
                    out["n_silent"].append(0)
                    out["silence_frac"].append(0.0)
                    out["max_silent_run"].append(0)
                    out["leads_with_silence"].append(False)
                    out["status"].append("corrupt")
            yield pd.DataFrame(out)

    return wavs.mapInPandas(
        silence,
        "doc_id bigint, n_frames int, n_silent int, silence_frac double, "
        "max_silent_run int, leads_with_silence boolean, status string",
    )
