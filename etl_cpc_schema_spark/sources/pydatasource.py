"""Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): the
ZIP-member line scan as a first-class ``spark.read.format("cpczip")``.

Why a custom source when :func:`~.readers.read_zip_members` exists:
the ``binaryFile``-based reader parallelizes per ARCHIVE (one task
must decompress every member of its zip), so a handful of fat
archives — the shape the reference's downloader actually produces
(downloader.py fetches one bulk zip per scheme version) — serializes
the scan.  This source enumerates members at PLANNING time from the
zip central directories (a driver-side, metadata-only read) and emits
one input partition PER MEMBER, so a 1000-executor cluster keeps all
wheels turning on two archives with 5000 members each.

Semantics match ``read_zip_members`` exactly (same three columns,
same ``archive!member`` source_file collision-proofing, same
prefix/suffix member filters, same tolerate-bad-zip behavior) —
pinned by tests/test_sources.py::test_cpczip_datasource_*.

Paths are driver/executor-visible filesystem paths (local/NFS — the
test rig's shape).  Object-store deployments swap the ``open`` calls
for an fsspec filesystem; the partitioning story is unchanged.
"""

from __future__ import annotations

import glob as _glob
import zipfile
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = "file_name string, source_file string, line string"


class ZipMemberPartition(InputPartition):
    """One zip member = one Spark input partition."""

    def __init__(self, archive: str, member: str):
        self.archive = archive
        self.member = member


def _member_name(member: str) -> str:
    return member.split("/")[-1]


class CpcZipReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path", "")
        self.member_prefix = options.get("member_prefix", "")
        self.member_suffix = options.get("member_suffix", "")

    def partitions(self) -> Sequence[InputPartition]:
        parts: list[InputPartition] = []
        for archive in sorted(_glob.glob(self.path)):
            try:
                zf = zipfile.ZipFile(archive)
            except (zipfile.BadZipFile, IsADirectoryError, OSError):
                continue  # tolerate stray/truncated files, like S4
            with zf:
                for member in zf.namelist():
                    name = _member_name(member)
                    if self.member_prefix and not name.startswith(
                        self.member_prefix
                    ):
                        continue
                    if self.member_suffix and not name.endswith(
                        self.member_suffix
                    ):
                        continue
                    parts.append(ZipMemberPartition(archive, member))
        # Spark requires a non-empty partition list; a no-match scan
        # yields an empty frame through one no-op partition.
        return parts or [ZipMemberPartition("", "")]

    def read(self, partition: ZipMemberPartition) -> Iterator[tuple]:
        if not partition.archive:
            return
        name = _member_name(partition.member)
        source_file = f"{partition.archive}!{partition.member}"
        with zipfile.ZipFile(partition.archive) as zf:
            with zf.open(partition.member) as f:
                for raw in f:
                    yield (
                        name,
                        source_file,
                        raw.decode("utf-8", errors="replace").strip(),
                    )


class CpcZipDataSource(DataSource):
    """``spark.read.format("cpczip").option("member_prefix", ...)
    .load("/raw/*.zip")`` — register with
    ``spark.dataSource.register(CpcZipDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "cpczip"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> CpcZipReader:
        return CpcZipReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CpcZipDataSource)
