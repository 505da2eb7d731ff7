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

__all__ = ["pack_content_zip", "unpack_content_zip"]

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
