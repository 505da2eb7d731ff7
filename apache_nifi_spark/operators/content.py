"""Content (de)compression and archive (un)packing — SURVEY.md §2.4/§2.5.

Covers ``CompressContent`` (codec level: Spark readers/writers handle
gzip/snappy/zstd transparently via the ``compression`` option — see
``sources.formats``) and ``UnpackContent``/``MergeContent(zip)`` at the
archive level.

Archive packing is genuinely byte-imperative (zip central directory), so
this is one of the few sanctioned Python seams (SURVEY.md §2.10): Arrow-
batched ``mapInPandas``, never row-at-a-time UDFs.  Each batch is packed/
unpacked independently on executors — no driver involvement, no shuffle;
at 100 TB the archive blobs stream through executor memory one Arrow
batch at a time.
"""

from __future__ import annotations

import io as _io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "merge_content_text",
    "pack_content_zip",
    "unpack_content_zip",
    "compress_content",
    "decompress_content",
]

_PACKED_SCHEMA = "id bigint, archive binary"
_UNPACKED_SCHEMA = "id bigint, entry_name string, payload binary"


def pack_content_zip(
    df: DataFrame, id_col: str, name_col: str, payload_col: str
) -> DataFrame:
    """MergeContent(zip strategy) per row-group: wrap each row's payload
    into a single-entry zip archive (STORED — deterministic bytes, no
    deflate timestamp drift).  Output: (id, archive binary)."""

    def _one(name, payload) -> bytes:
        buf = _io.BytesIO()
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
            # fixed date_time keeps archive bytes reproducible
            info = zipfile.ZipInfo(str(name), (1980, 1, 1, 0, 0, 0))
            zf.writestr(info, bytes(payload))
        return buf.getvalue()

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar zip over the two columns — no iterrows
            blobs = [
                _one(n, p) for n, p in zip(pdf[name_col], pdf[payload_col])
            ]
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "archive": blobs})

    return df.mapInPandas(_pack, _PACKED_SCHEMA)


def unpack_content_zip(df: DataFrame, id_col: str, archive_col: str) -> DataFrame:
    """UnpackContent (zip): one output row per archive entry, with the
    entry name as NiFi's ``segment.original.filename`` analog."""

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, names, payloads = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[archive_col]):
                with zipfile.ZipFile(_io.BytesIO(bytes(blob))) as zf:
                    for entry in zf.namelist():
                        ids.append(int(rid))
                        names.append(entry)
                        payloads.append(zf.read(entry))
            yield pd.DataFrame(
                {"id": pd.Series(ids, dtype="int64"), "entry_name": names,
                 "payload": payloads}
            )

    return df.mapInPandas(_unpack, _UNPACKED_SCHEMA)


#: codec name → (compress, decompress) over bytes — the stdlib half of
#: NiFi CompressContent's codec menu (snappy/lz4 need external libs and
#: already ride Spark's writer `compression` option at the FILE level).
def _codecs():
    import bz2
    import gzip as _gzip
    import lzma
    import zlib

    return {
        "gzip": (lambda b: _gzip.compress(b, mtime=0), _gzip.decompress),
        "bzip2": (bz2.compress, bz2.decompress),
        "xz": (lzma.compress, lzma.decompress),
        "deflate": (zlib.compress, zlib.decompress),
    }


def compress_content(
    df: DataFrame, content_col: str, codec: str = "gzip", out_col: str | None = None
) -> DataFrame:
    """CompressContent, per-RECORD (NiFi compresses each FlowFile's
    content; the writer-level ``compression`` option covers whole
    files).  Stdlib codecs gzip/bzip2/xz/deflate over Arrow batches —
    gzip with ``mtime=0`` so output bytes are deterministic.
    ``out_col`` defaults to replacing the content column."""
    return _recode(df, content_col, codec, out_col, mode=0)


def decompress_content(
    df: DataFrame, content_col: str, codec: str = "gzip", out_col: str | None = None
) -> DataFrame:
    """CompressContent's decompress mode — the inverse per-record codec."""
    return _recode(df, content_col, codec, out_col, mode=1)


def _recode(df, content_col, codec, out_col, mode):
    if codec not in _codecs():
        raise ValueError(f"unsupported codec {codec!r} (have {sorted(_codecs())})")
    from pyspark.sql.types import BinaryType, StructType

    out_col = out_col or content_col
    if out_col == content_col:
        schema = df.schema
    else:
        schema = StructType(list(df.schema.fields)).add(out_col, BinaryType())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = _codecs()[codec][mode]
        for pdf in batches:
            pdf[out_col] = [
                fn(bytes(p)) if p is not None else None for p in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema)


def merge_content_text(
    df,
    group_col: str,
    content_col: str,
    order_col: str,
    header: str = "",
    demarcator: str = "\n",
    footer: str = "",
):
    """MergeContent's Binary-Concatenation mode with Header/Demarcator/
    Footer [2.7.2-surface]: each bin (group) merges its members' content
    in a TOTAL order into one payload framed by the configured strings.

    Columnar: sort_array over (order, content) structs keeps the merge
    deterministic, array_join applies the demarcator, concat frames it —
    one shuffle on the bin key with map-side partial collect.  Bin size
    is the operator's own bound (NiFi bins cap at Max Group Size); a bin
    must fit an executor, same contract as the zip packer above.
    """
    from pyspark.sql import functions as F

    merged = F.concat(
        F.lit(header),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"),
                                            F.col(content_col).alias("c")))
                ),
                lambda s: s["c"],
            ),
            demarcator,
        ),
        F.lit(footer),
    )
    return df.groupBy(group_col).agg(
        merged.alias("merged_content"),
        F.count(F.lit(1)).alias("fragment_count"),
    )
