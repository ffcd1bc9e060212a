"""Multimodal column handling: opaque ``binary`` payload columns with
typed metadata, processed by Arrow-batched ``mapInPandas`` pipelines.

Two REAL pure-stdlib decode paths exist — ``decode_wav`` (RIFF/WAV
PCM16 audio through the stdlib ``wave`` module) and ``decode_ppm``
(binary P6 PPM images through a hand-rolled header parser). Encode
and decode deliberately do NOT share code: WAV payloads are written
by a manual RIFF byte packer and read back by ``wave``; PPM payloads
are written from a numpy pixel array and read back by the
from-scratch parser — a bug on either side surfaces as a feature
mismatch against the closed-form oracle, not a silent cancel-out.

Formats the container genuinely cannot touch (JPEG, MP4, …) keep the
explicit stubs: ``DecodeStub`` raises NotImplementedError (the honest
production placeholder) and ``fake_image_decode`` produces a
deterministic fake for plumbing tests.

Design for 100 TB of media:
- payloads stay in ``binary`` columns co-located with metadata —
  never driver-collected, never stringified;
- ``mapInPandas`` streams Arrow record batches, so peak executor
  memory is one batch of payloads (bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``), not a partition;
- feature extraction emits fixed-schema narrow rows; downstream ops
  are ordinary columnar Spark.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_sum_mod", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
    ]
)

MOD = 1_000_000_007


class DecodeStub:
    """Production decode placeholder: the real implementation would
    call PIL/av/librosa here. Kept as an explicit NotImplementedError
    so nothing silently ships fake features."""

    def __call__(self, payload: bytes) -> object:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; inject a real decoder or use fake_image_decode"
        )


def fake_image_decode(payload: bytes) -> dict:
    """Deterministic decode stand-in: derives 'features' purely from
    the bytes, so tests exercise the full Arrow round-trip."""
    return {
        "n_bytes": len(payload),
        "byte_sum_mod": sum(payload) % MOD,
        "digest": hashlib.md5(payload).hexdigest(),
    }


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads
    (the testdata has no binary fixtures; UTF-8 bytes of ``text`` give
    a real binary column with verifiable content)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
    )


def extract_features(media: DataFrame, decode=fake_image_decode) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p if p is not None else b"") for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "n_bytes", "byte_sum_mod", "digest"]]

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# --------------------------------------------------------------------
# real WAV (PCM16 mono) path: manual RIFF encoder, stdlib ``wave``
# decoder
# --------------------------------------------------------------------


def encode_wav_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """Manual RIFF/WAVE byte packer for mono 16-bit PCM — written
    field-by-field with ``struct`` (NOT via the ``wave`` module, which
    is reserved for the decode side so the round-trip is two
    independent implementations)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode through the stdlib ``wave`` reader: parses
    the RIFF container, extracts PCM16 frames, and derives integer
    amplitude features (exact — no float summation, so the DuckDB
    oracle can replay them closed-form)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"expected PCM16, got sampwidth={w.getsampwidth()}")
        n = w.getnframes()
        raw = w.readframes(n)
        meta = (w.getframerate(), w.getnchannels())
    # abs(-32768) overflows int16 — widen before the abs
    signed = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    s = np.abs(signed)
    return {
        "sample_rate": meta[0],
        "n_channels": meta[1],
        "n_samples": n,
        "peak_abs": int(s.max()) if len(s) else 0,
        "sum_abs": int(s.sum()),
        # position-weighted SIGNED checksum (r11, the audio twin of
        # decode_ppm's wsum_lum): peak/abs-sum are permutation- and
        # sign-invariant — a decoder that reversed frame order or
        # flipped sample sign would pass them; Σ s[i]·i cannot.
        "wsum_amp": int((signed * np.arange(len(signed))).sum()),
    }


WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("peak_abs", T.IntegerType(), False),
        T.StructField("sum_abs", T.LongType(), False),
        T.StructField("wsum_amp", T.LongType(), False),
    ]
)


def wav_samples_for(media_id: int) -> np.ndarray:
    """The deterministic synthetic signal for ``media_id``:
    ``n = 200 + id % 100`` samples, ``s[i] = ((id*31 + i*17) % 65536)
    - 32768``. Integer-exact and engine-portable — the DuckDB oracle
    reproduces the decoded features from this formula alone."""
    n = 200 + int(media_id) % 100
    i = np.arange(n, dtype=np.int64)
    return (((int(media_id) * 31 + i * 17) % 65536) - 32768).astype("<i2")


def synthesize_wav_corpus(ids: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """Arrow-batched payload synthesis: one real WAV file per id.
    Stands in for the ingest step (payloads normally arrive from
    object storage); everything downstream treats the bytes as opaque."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav_pcm16(wav_samples_for(mid), sample_rate)
                for mid in pdf["media_id"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return ids.mapInPandas(gen, schema="media_id long, payload binary")


def _with_payload(pdf: pd.DataFrame) -> pd.DataFrame:
    """Drop NULL payloads before decoding: MEDIA_SCHEMA declares
    payload nullable (a failed object-store fetch is the normal
    source of NULLs), and the real decoders rightly crash on None.
    No feature row is emitted for a missing payload — callers find
    fetch gaps with an anti-join on media_id (the feature schemas
    are non-nullable, so NULL-feature rows are not an option)."""
    return pdf[pdf["payload"].notna()]


def extract_wav_features(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Arrow-batched REAL decode of WAV payloads → integer features.

    ``on_error``: ``"raise"`` (default) fails the job on the first
    undecodable payload, with the offending ``media_id`` in the error
    (a bare wave.Error out of a 100 TB corpus is otherwise
    unfindable); ``"skip"`` drops corrupt rows and keeps the job alive
    — the corpus-curation mode, where one truncated upload must not
    kill the whole feature pass. Quarantined ids are the anti-join of
    input and output media_id.

    NULL payloads are NOT decode errors and quarantine under BOTH
    modes: MEDIA_SCHEMA declares payload nullable precisely because a
    failed object-store fetch records NULL — a known, upstream,
    anti-join-discoverable condition, not a data fault this operator
    can diagnose (r15, ADVICE)."""
    return _extract_decoded(
        media, decode_wav, WAV_FEATURE_SCHEMA, on_error, "WAV"
    )


# --------------------------------------------------------------------
# real PPM (binary P6) path: numpy array writer, hand-rolled parser
# --------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """P6 writer: ``pixels`` is an (H, W, 3) uint8 array."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("P6 needs 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8
    ).tobytes()


def _ppm_header_tokens(payload: bytes, start: int = 0) -> tuple[list[int], int]:
    """Parse the P6 header byte-by-byte (whitespace- and
    ``#``-comment-aware, per the netpbm spec) beginning at ``start``:
    returns (width, height, maxval) and the ABSOLUTE offset where
    pixel data starts. The offset parameter lets container walkers
    (``split_video_frames``) parse frame N's header in place instead
    of slicing the remaining buffer per frame (which would copy
    O(n_frames × payload) — quadratic for long videos)."""
    if payload[start : start + 2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    tokens: list[int] = []
    pos = start + 2
    tok = b""
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        ch = payload[pos : pos + 1]
        if ch == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            if tok:
                tokens.append(int(tok))
                tok = b""
        else:
            tok += ch
        pos += 1
    if tokens[2] != 255:
        # netpbm: maxval > 255 means 2-byte samples — silently reading
        # W*H*3 single bytes would return garbage features (and walk
        # the video container into mid-frame). The in-tree encoder
        # always writes 255; anything else must fail loudly.
        raise ValueError(
            f"unsupported P6 maxval {tokens[2]} (only 255 / 1-byte "
            "samples are supported)"
        )
    return tokens, pos


def decode_ppm(payload: bytes) -> dict:
    """REAL image decode: from-scratch P6 parser → per-channel
    integer features (again exact, for closed-form oracle replay).

    ``wsum_lum`` is a POSITION-weighted checksum: per-pixel luminance
    (r+g+b) times the pixel's row-major offset, summed. The plain
    channel sums are permutation-invariant — a decoder that transposed
    the image, flipped a row order, or shuffled pixels inside an Arrow
    batch would still pass them; the weighted sum pins every pixel to
    its exact (x, y)."""
    (w, h, maxval), pos = _ppm_header_tokens(payload)
    n = w * h * 3
    body = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    px = body.reshape(-1, 3).astype(np.int64)
    sums = px.sum(axis=0)
    wsum = int((px.sum(axis=1) * np.arange(w * h, dtype=np.int64)).sum())
    return {
        "width": w,
        "height": h,
        "maxval": maxval,
        "sum_r": int(sums[0]),
        "sum_g": int(sums[1]),
        "sum_b": int(sums[2]),
        "wsum_lum": wsum,
    }


PPM_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("maxval", T.IntegerType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
        T.StructField("wsum_lum", T.LongType(), False),
    ]
)

PPM_W, PPM_H = 16, 12


def ppm_pixels_for(media_id: int) -> np.ndarray:
    """Deterministic (H, W, 3) test image: ``r=(id+x+y)%256``,
    ``g=(id*3+x)%256``, ``b=(id*7+y)%256`` — closed-form for the
    oracle."""
    mid = int(media_id)
    x = np.arange(PPM_W, dtype=np.int64)[None, :]
    y = np.arange(PPM_H, dtype=np.int64)[:, None]
    r = (mid + x + y) % 256
    g = (mid * 3 + x) % 256
    b = (mid * 7 + y) % 256
    return np.stack(
        [np.broadcast_to(r, (PPM_H, PPM_W)),
         np.broadcast_to(g, (PPM_H, PPM_W)),
         np.broadcast_to(b, (PPM_H, PPM_W))],
        axis=-1,
    ).astype(np.uint8)


def synthesize_ppm_corpus(ids: DataFrame) -> DataFrame:
    """One real P6 image payload per id (see synthesize_wav_corpus)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [encode_ppm(ppm_pixels_for(m)) for m in pdf["media_id"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return ids.mapInPandas(gen, schema="media_id long, payload binary")


def extract_ppm_features(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Arrow-batched REAL decode of P6 payloads → integer features.
    ``on_error`` as in :func:`extract_wav_features`."""
    return _extract_decoded(
        media, decode_ppm, PPM_FEATURE_SCHEMA, on_error, "PPM"
    )


def _extract_decoded(
    media: DataFrame, decode, schema, on_error: str, what: str
) -> DataFrame:
    """Shared decode→features driver. One corrupt payload previously
    killed the whole job with a context-free parser error (r14 sweep:
    wave.Error / struct.error / ValueError with no media_id); now the
    default failure NAMES the offending media_id, and ``on_error=
    "skip"`` quarantines corrupt rows instead of dying — a curation
    pass over a real corpus must survive a truncated upload.

    NULL payloads quarantine under BOTH modes (``_with_payload``,
    before the decode loop): a NULL is a recorded fetch gap, not an
    undecodable byte string — ``on_error`` governs decode faults
    only (r15, ADVICE: the contract is documented here rather than
    an unreachable in-loop None branch pretending to raise)."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = _with_payload(pdf)
            if not len(pdf):
                continue
            rows, ids = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rows.append(decode(p))
                    ids.append(mid)
                except Exception as e:
                    if on_error == "raise":
                        raise ValueError(
                            f"undecodable {what} payload for "
                            f"media_id={mid}: {e}"
                        ) from e
                    continue  # skip: quarantine the corrupt row
            if not rows:
                continue  # all-skipped batch: empty frame would mistype
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", ids)
            yield out

    return media.mapInPandas(run, schema=schema)


# -- resize & video frame sampling --------------------------------------


def ppm_to_array(payload: bytes) -> np.ndarray:
    """Full P6 decode to an (H, W, 3) uint8 array (header parser
    shared with decode_ppm)."""
    (w, h, _maxval), pos = _ppm_header_tokens(payload)
    body = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return body.reshape(h, w, 3)


def resize_nearest(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize: source pixel (x*W)//out_w,
    (y*H)//out_h — integer-exact index math, so the oracle can state
    the resized image in closed form. Returns a re-encoded P6."""
    img = ppm_to_array(payload)
    h, w, _ = img.shape
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return encode_ppm(img[ys[:, None], xs[None, :]])


def resize_ppm_features(
    media: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """Arrow-batched decode → nearest-neighbor resize → re-encode →
    feature-extract, all inside one mapInPandas stage (the bytes never
    leave the executor — at 100 TB the resize is a map-only pass with
    zero shuffle)."""
    if out_w < 1 or out_h < 1:
        # np.arange(0) silently yields a 0-pixel image whose encode/
        # decode round-trip is degenerate junk, per-row (r16)
        raise ValueError(
            f"resize target must be >= 1x1, got {out_w}x{out_h}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = _with_payload(pdf)
            if not len(pdf):
                continue
            rows = [
                decode_ppm(resize_nearest(p, out_w, out_h))
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(rows)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=PPM_FEATURE_SCHEMA)


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Minimal video container: concatenated P6 frames (each frame a
    complete self-describing P6 payload). Opaque binary column on the
    Spark side, fully parseable with the same header walker."""
    return b"".join(encode_ppm(f) for f in frames)


def split_video_frames(payload: bytes) -> list[bytes]:
    """Walk the concatenated-P6 container: each frame's length is its
    header length + W*H*3, so the split is exact with no sentinels.
    Headers are parsed in place via the ``start`` offset; only each
    final frame's bytes are sliced — O(payload) total, not quadratic."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(payload):
        (w, h, _m), data_off = _ppm_header_tokens(payload, pos)
        end = data_off + w * h * 3
        frames.append(payload[pos:end])
        pos = end
    return frames


def sample_video_frames(
    media: DataFrame, every_k: int = 2
) -> DataFrame:
    """Frame sampling over video payloads: parse the container, keep
    every ``every_k``-th frame, decode each kept frame to features.
    One mapInPandas stage — the explode happens executor-side on the
    decoded rows, not on the binary (the payload is read once)."""
    if every_k < 1:
        # range(0, n, 0) raises ZeroDivisionError-style errors inside
        # the executor task naming neither param nor operator (r16)
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    schema = T.StructType(
        [T.StructField("media_id", T.LongType(), False),
         T.StructField("n_frames", T.IntegerType(), False),
         T.StructField("frame_idx", T.IntegerType(), False)]
        + [f for f in PPM_FEATURE_SCHEMA.fields if f.name != "media_id"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = _with_payload(pdf)
            out_rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = split_video_frames(payload)
                for i in range(0, len(frames), every_k):
                    row = {"media_id": mid, "n_frames": len(frames),
                           "frame_idx": i}
                    row.update(decode_ppm(frames[i]))
                    out_rows.append(row)
            yield pd.DataFrame(out_rows)

    return media.mapInPandas(run, schema=schema)


def synthesize_video_corpus(ids: DataFrame, n_frames: int = 4) -> DataFrame:
    """One concatenated-P6 video per id; frame f's pixels use the
    closed-form pattern seeded with ``id * 10 + f`` (oracle-stateable)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_video(
                    [ppm_pixels_for(m * 10 + f) for f in range(n_frames)]
                )
                for m in pdf["media_id"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return ids.mapInPandas(gen, schema="media_id long, payload binary")


# -- perceptual hashing (image near-dup detection) -----------------------


def ahash_ppm(payload: bytes, grid: int = 8) -> str:
    """Average-hash of a P6 image: nearest-neighbor downsample to
    ``grid``×``grid``, luminance = r+g+b (integer, no division), bit =
    luminance strictly above the image mean — compared CROSS-MULTIPLIED
    (``lum * grid² > total``) so the threshold is integer-exact and an
    oracle can restate it. Returned as a row-major '0'/'1' string
    (64 chars at grid=8): no 64-bit sign pitfalls, trivially portable.

    This is the canonical image near-dup fingerprint (same family as
    pHash/dHash): re-encodes, minor crops, and resizes of an image map
    to equal or near-equal hashes, so exact-grouping (or hamming
    banding, via the simhash machinery) finds duplicate images the
    byte-level md5 never could."""
    img = ppm_to_array(payload).astype(np.int64)
    h, w, _ = img.shape
    ys = (np.arange(grid, dtype=np.int64) * h) // grid
    xs = (np.arange(grid, dtype=np.int64) * w) // grid
    lum = img[ys[:, None], xs[None, :]].sum(axis=2)
    total = int(lum.sum())
    bits = (lum * (grid * grid)) > total
    return "".join("1" if b else "0" for b in bits.flatten())


def ppm_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Arrow-batched decode → average-hash, one mapInPandas stage —
    the image bytes never cross a shuffle; only the 64-char hash
    (and the id) continues into the grouping exchange."""
    if grid < 1:
        # a 0-cell hash is an empty string that every image shares —
        # all images become "duplicates", silently (r16)
        raise ValueError(f"grid must be >= 1, got {grid}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = _with_payload(pdf)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "ahash": [ahash_ppm(p, grid) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, schema="media_id long, ahash string")
