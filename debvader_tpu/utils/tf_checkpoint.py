"""TensorFlow checkpoint reader — pure Python, no TF dependency.

The reference ships its pretrained DC2 weights as a TF "TensorBundle"
checkpoint (data/weights/dc2/weights_noisy_v4.386--6.61.ckpt.*, loaded via
tf.train.latest_checkpoint + net.load_weights at model/model.py:262-266).
This module parses that format directly:

- the ``.index`` file is an SSTable (leveldb-style) mapping tensor keys to
  BundleEntryProto records (dtype, shape, shard, offset, size);
- the ``.data-XXXXX-of-YYYYY`` shards are raw little-endian tensor bytes.

Keys follow Keras object-graph naming
(``layer_with_weights-N/kernel/.ATTRIBUTES/VARIABLE_VALUE``); the importer in
``weight_import.py`` maps those onto our Flax pytree.

NOTE: in this repo snapshot the second data shard is stripped
(.MISSING_LARGE_BLOBS), so only tensors living in shard 0 can be
materialized; the full shape table is still available from the index and is
used as the architecture golden test.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path

import numpy as np

__all__ = ["BundleEntry", "read_index", "read_tensor", "load_available_tensors"]

_TABLE_MAGIC = 0xDB4775248B80FB57

# tensorflow DataType enum values we care about
_DTYPES = {
    1: np.float32,
    2: np.float64,
    3: np.int32,
    4: np.uint8,
    6: np.int8,
    7: str,  # string (unused here)
    9: np.int64,
    10: np.bool_,
    14: "bfloat16",  # no stock-numpy dtype: decoded by widening in read_tensor
    19: np.float16,
}


@dataclass
class BundleEntry:
    dtype: int
    shape: tuple[int, ...]
    shard_id: int
    offset: int
    size: int

    @property
    def numpy_dtype(self):
        return _DTYPES.get(self.dtype, None)


# --------------------------------------------------------------- varint/proto
def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _parse_tensor_shape(buf: bytes) -> tuple[int, ...]:
    """TensorShapeProto: repeated Dim { int64 size = 1; string name = 2 } = 2."""
    dims = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 2 and wire == 2:  # Dim message
            ln, pos = _read_varint(buf, pos)
            dim_buf = buf[pos : pos + ln]
            pos += ln
            dpos = 0
            size = None
            while dpos < len(dim_buf):
                dtag, dpos = _read_varint(dim_buf, dpos)
                dfield, dwire = dtag >> 3, dtag & 7
                if dfield == 1 and dwire == 0:
                    size, dpos = _read_varint(dim_buf, dpos)
                elif dwire == 2:
                    ln2, dpos = _read_varint(dim_buf, dpos)
                    dpos += ln2
                else:
                    raise ValueError("unexpected dim field")
            dims.append(size)
        elif wire == 0:
            _, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            pos += ln
        else:
            raise ValueError(f"unexpected wire type {wire}")
    return tuple(dims)


def _parse_bundle_entry(buf: bytes) -> BundleEntry:
    """BundleEntryProto: dtype=1, shape=2, shard_id=3, offset=4, size=5,
    crc32c=6, slices=7."""
    dtype = 0
    shape: tuple[int, ...] = ()
    shard = 0
    offset = 0
    size = 0
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
            if field == 1:
                dtype = val
            elif field == 3:
                shard = val
            elif field == 4:
                offset = val
            elif field == 5:
                size = val
        elif wire == 5:  # fixed32 (crc)
            pos += 4
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            sub = buf[pos : pos + ln]
            pos += ln
            if field == 2:
                shape = _parse_tensor_shape(sub)
        else:
            raise ValueError(f"unexpected wire type {wire}")
    return BundleEntry(dtype, shape, shard, offset, size)


# ------------------------------------------------------------------- sstable
def _read_block(data: bytes, offset: int, size: int) -> bytes:
    """Block contents + 1-byte compression type + 4-byte crc."""
    block = data[offset : offset + size]
    ctype = data[offset + size]
    if ctype == 0:  # no compression
        return block
    if ctype == 1:  # snappy
        try:
            import snappy  # pragma: no cover

            return snappy.uncompress(block)
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("snappy-compressed checkpoint; snappy missing") from e
    raise ValueError(f"unknown block compression {ctype}")


def _iter_block_entries(block: bytes):
    """Yield (key, value) pairs from a prefix-compressed table block."""
    n_restarts = struct.unpack("<I", block[-4:])[0]
    data_end = len(block) - 4 - 4 * n_restarts
    pos = 0
    key = b""
    while pos < data_end:
        shared, pos = _read_varint(block, pos)
        unshared, pos = _read_varint(block, pos)
        value_len, pos = _read_varint(block, pos)
        key = key[:shared] + block[pos : pos + unshared]
        pos += unshared
        value = block[pos : pos + value_len]
        pos += value_len
        yield key.decode("utf-8", "replace"), value


def _read_handle(buf: bytes, pos: int = 0):
    offset, pos = _read_varint(buf, pos)
    size, pos = _read_varint(buf, pos)
    return offset, size, pos


def read_index(index_path: str | Path) -> dict[str, BundleEntry]:
    """Parse a .index file into {tensor_key: BundleEntry}."""
    data = Path(index_path).read_bytes()
    footer = data[-48:]
    magic = struct.unpack("<Q", footer[-8:])[0]
    if magic != _TABLE_MAGIC:
        raise ValueError(f"not an SSTable: bad magic {magic:#x}")
    # footer: metaindex handle, index handle (varint-encoded), padding, magic
    _, _, pos = _read_handle(footer, 0)
    index_off, index_size, _ = _read_handle(footer, pos)
    index_block = _read_block(data, index_off, index_size)

    entries: dict[str, BundleEntry] = {}
    for _, handle_val in _iter_block_entries(index_block):
        off, size, _ = _read_handle(handle_val, 0)
        for key, value in _iter_block_entries(_read_block(data, off, size)):
            if not key:  # header entry (BundleHeaderProto)
                continue
            try:
                entries[key] = _parse_bundle_entry(value)
            except (ValueError, IndexError):
                continue
    return entries


def read_tensor(
    ckpt_prefix: str | Path, key: str, entries: dict[str, BundleEntry] | None = None
) -> np.ndarray:
    """Materialize one tensor from its data shard."""
    ckpt_prefix = str(ckpt_prefix)
    entries = entries or read_index(ckpt_prefix + ".index")
    e = entries[key]
    # shard file name: <prefix>.data-0000S-of-0000N
    n_shards = 1 + max(x.shard_id for x in entries.values())
    shard_path = Path(f"{ckpt_prefix}.data-{e.shard_id:05d}-of-{n_shards:05d}")
    if not shard_path.exists():
        raise FileNotFoundError(f"shard {shard_path} missing (stripped snapshot?)")
    with open(shard_path, "rb") as f:
        f.seek(e.offset)
        raw = f.read(e.size)
    dt = e.numpy_dtype
    if dt is None:
        raise ValueError(f"unsupported dtype {e.dtype} for {key}")
    if dt == "bfloat16":
        # Widen bf16 bit patterns into float32 (bf16 is the top 16 bits of
        # an f32); never hand back raw uint16 as parameter values.
        bits = np.frombuffer(raw, dtype="<u2").astype(np.uint32) << 16
        return bits.view(np.float32).reshape(e.shape).copy()
    return np.frombuffer(raw, dtype=dt).reshape(e.shape).copy()


def load_available_tensors(ckpt_prefix: str | Path) -> dict[str, np.ndarray]:
    """All tensors whose shard file exists (partial snapshots load
    partially)."""
    entries = read_index(str(ckpt_prefix) + ".index")
    out = {}
    for key, e in entries.items():
        if e.numpy_dtype is None or e.numpy_dtype is str:
            continue
        try:
            out[key] = read_tensor(ckpt_prefix, key, entries)
        except FileNotFoundError:
            continue
    return out
