"""Structured Streaming SOURCE over the Iceberg table layer.

``spark.readStream.format("htrtf_iceberg").option("location", path)``
turns the continuous-ingest tick loop into a real streaming query: the
micro-batch OFFSET is the table's last committed SEQUENCE NUMBER, so
each batch reads exactly the data files appended in
(start_seq, end_seq] — the same sequence-window file pruning as
``read_iceberg_increment``, with Spark's own checkpointing providing
exactly-once offsets across restarts (no custom marker property
needed on the source side).

Built on PySpark 4's Python DataSource API
(pyspark.sql.datasource — public, apache/spark
python/pyspark/sql/datasource.py): the planner runs DRIVER-side
against table metadata only; each data file becomes one
InputPartition, and EXECUTORS read their parquet file via pyarrow and
yield Arrow RecordBatches (no per-row Python).

Semantics (append-stream contract):
- rows are surfaced once, at the snapshot that appended them;
- delete files visible at the batch's upper snapshot ARE applied to
  the batch's own files (equality deletes: strictly-newer-sequence
  rule; position deletes: ≥-sequence rule) — matching
  ``read_iceberg_increment``;
- deletes of rows emitted by EARLIER batches are not retracted
  (streams are append-only; run compaction + a batch re-read for
  retractions), and column renames are handled by field-id resolution
  exactly like the batch reader.

Batch-mode ``spark.read.format("htrtf_iceberg")`` is intentionally NOT
implemented — ``read_iceberg_table`` is the batch path (full delete
application, time travel, stats pruning).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _FilePartition(InputPartition):
    def __init__(
        self,
        file_path: str,
        seq: int,
        col_map: list,          # [(write_name|None, target_name, ice_type)]
        part_vals: list,        # [(target_name, value)] identity partitions
        eq_deletes: list,       # [(dseq, [(delete_col, data_col)], path)]
        pos_deletes: list,      # [(dseq, path)]
    ):
        self.file_path = file_path
        self.seq = seq
        self.col_map = col_map
        self.part_vals = part_vals
        self.eq_deletes = eq_deletes
        self.pos_deletes = pos_deletes


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, location: str):
        self.location = location

    # ------------------------------------------------ driver-side plan
    def initialOffset(self) -> dict:
        # start of stream = nothing consumed; the first batch surfaces
        # the whole current table (seq window (0, latest])
        return {"seq": 0}

    def latestOffset(self) -> dict:
        from htrtf_spark.sources.iceberg import current_metadata

        return {"seq": int(current_metadata(self.location)["last-sequence-number"])}

    def partitions(self, start: dict, end: dict):
        from htrtf_spark.sources.iceberg import (
            _schema_by_id,
            added_data_files,
            current_metadata,
            live_delete_files,
        )

        lo, hi = int(start["seq"]), int(end["seq"])
        meta = current_metadata(self.location)
        # PIN the window to table METADATA snapshots: each batch
        # surfaces the files each APPEND snapshot in (lo, hi] itself
        # added, read from that snapshot's OWN manifest list. Planning
        # from the CURRENT live file set would let a compaction
        # committed between offset capture and planning (or before a
        # checkpoint replay) swap the file set: rewritten files carry a
        # NEW sequence (whole-table duplication) while the window's
        # original appends disappear from the live view (loss).
        # REPLACE snapshots are skipped outright - rewritten old rows,
        # not new data (the Iceberg incremental-append-scan rule).
        end_snap = None
        for sn in meta["snapshots"]:
            if int(sn["sequence-number"]) == hi:
                end_snap = sn
                break
        if end_snap is None:
            raise RuntimeError(
                f"offset snapshot (sequence {hi}) is no longer in "
                f"{self.location!r} metadata (expired between offset "
                "capture and planning?) - restart from a fresh "
                "checkpoint to re-baseline"
            )
        window = [
            sn
            for sn in sorted(
                meta["snapshots"], key=lambda x: x["sequence-number"]
            )
            if lo < int(sn["sequence-number"]) <= hi
            and sn.get("summary", {}).get("operation") != "replace"
        ]
        ice_schema = _schema_by_id(
            meta, end_snap.get("schema-id", meta["current-schema-id"])
        )
        ice_by_id = {f["id"]: f for f in ice_schema["fields"]}

        # deletes visible at the batch's upper snapshot
        deletes = live_delete_files(
            self.location, snapshot_id=end_snap["snapshot-id"]
        )
        if lo == 0:
            # FIRST batch = full load of the pinned snapshot (live
            # files, replace snapshots included): a stream starting on
            # a table whose pre-compaction history was expired would
            # otherwise skip the replace snapshot and surface NOTHING.
            # Exactly extract_increment_once's bootstrap semantics.
            from htrtf_spark.sources.iceberg import live_data_files

            records = live_data_files(
                self.location, snapshot_id=end_snap["snapshot-id"]
            )
        else:
            records = [
                r for sn in window for r in added_data_files(self.location, sn)
            ]
        parts = []
        for rec in records:
            wmap = {f["id"]: f["name"] for f in rec["_write_fields"]}
            part_vals = {}
            for pfield in rec["_spec_fields"]:
                if pfield["transform"] != "identity":
                    continue
                src = ice_by_id.get(pfield["source-id"])
                if src is not None:
                    part_vals[src["name"]] = rec["partition"].get(
                        pfield["name"]
                    )
            # one entry per schema field IN SCHEMA ORDER — arrow batch
            # columns map to the declared schema BY POSITION, so
            # identity-partition columns must sit at their real slot,
            # not be appended at the end
            col_map = []
            for f in ice_schema["fields"]:
                if f["name"] in part_vals:
                    col_map.append(
                        ("\x00const", f["name"], f["type"], part_vals[f["name"]])
                    )
                else:
                    col_map.append(
                        (wmap.get(f["id"]), f["name"], f["type"], None)
                    )
            eq, pos = [], []
            for d in deletes:
                if d["content"] == 2 and d["_seq"] > rec["_seq"]:
                    dmap = {f["id"]: f["name"] for f in d["_write_fields"]}
                    # each key column needs BOTH write-time names:
                    # the DELETE file's and THIS DATA file's (renames
                    # between commits make them differ; field id is
                    # the join key, exactly the batch reader's rule)
                    cols = [
                        (dmap.get(fid, ice_by_id[fid]["name"]),
                         wmap.get(fid))
                        for fid in d["equality_ids"] or []
                        if fid in ice_by_id
                    ]
                    eq.append((d["_seq"], cols, d["file_path"]))
                elif d["content"] == 1 and d["_seq"] >= rec["_seq"]:
                    pos.append((d["_seq"], d["file_path"]))
            parts.append(
                _FilePartition(
                    rec["file_path"], rec["_seq"], col_map, part_vals, eq, pos
                )
            )
        if not parts:  # Spark requires ≥1 partition per batch
            parts = [_FilePartition(None, 0, [], [], [], [])]
        return parts

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint

    # --------------------------------------------- executor-side read
    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if partition.file_path is None:
            return iter(())
        tbl = pq.read_table(partition.file_path)

        # position deletes first (row index is this file's read order)
        if partition.pos_deletes:
            dead = set()
            for _dseq, dpath in partition.pos_deletes:
                dt = pq.read_table(dpath)
                for fp, p in zip(
                    dt.column("file_path").to_pylist(),
                    dt.column("pos").to_pylist(),
                ):
                    if fp == partition.file_path:
                        dead.add(p)
            if dead:
                keep = [i for i in range(tbl.num_rows) if i not in dead]
                tbl = tbl.take(keep)

        # equality deletes: drop rows whose key tuple appears in a
        # strictly-newer delete file (NULL-safe: None tuples compare
        # equal in python, matching the spec's null-key semantics)
        for _dseq, cols, dpath in partition.eq_deletes:
            if not cols or tbl.num_rows == 0:
                continue
            dt = pq.read_table(dpath)
            del_names = [dc for dc, _fc in cols]
            if any(dc not in dt.column_names for dc in del_names):
                continue
            keys = set(
                zip(*[dt.column(dc).to_pylist() for dc in del_names])
            )
            file_cols = []
            ok = True
            for _dc, fc in cols:
                if fc is None or fc not in tbl.column_names:
                    ok = False  # file predates the column: no match
                    break
                file_cols.append(tbl.column(fc).to_pylist())
            if not ok:
                continue
            mask = [t not in keys for t in zip(*file_cols)]
            tbl = tbl.filter(pa.array(mask))

        # field-id column resolution; identity partition columns are
        # materialized as TYPED constants at their schema position
        arrays, names = [], []
        for wname, tname, ice_t, const in partition.col_map:
            at = _ICE_TO_ARROW(ice_t)
            if wname == "\x00const":
                arrays.append(pa.array([const] * tbl.num_rows, type=at))
            elif wname is not None and wname in tbl.column_names:
                arrays.append(tbl.column(wname))
            else:
                arrays.append(pa.nulls(tbl.num_rows, type=at))
            names.append(tname)
        out = pa.table(dict(zip(names, arrays)))
        return iter(out.to_batches())


def _ICE_TO_ARROW(ice_t: str):
    import pyarrow as pa

    return {
        "string": pa.string(),
        "int": pa.int32(),
        "long": pa.int64(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "binary": pa.binary(),
        "timestamptz": pa.timestamp("us", tz="UTC"),
        "timestamp": pa.timestamp("us"),
    }[ice_t]


_ICE_TO_DDL = {
    "string": "string",
    "int": "int",
    "long": "bigint",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "binary": "binary",
    "timestamptz": "timestamp",
    "timestamp": "timestamp_ntz",
}


class IcebergIncrementalSource(DataSource):
    """format("htrtf_iceberg") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "htrtf_iceberg"

    def schema(self) -> str:
        from htrtf_spark.sources.iceberg import _schema_by_id, current_metadata

        loc = self.options.get("location")
        if not loc:
            raise ValueError("htrtf_iceberg needs .option('location', <table path>)")
        meta = current_metadata(loc)
        ice_schema = _schema_by_id(meta, meta["current-schema-id"])
        cols = ", ".join(
            f"{f['name']} {_ICE_TO_DDL[f['type']]}" for f in ice_schema["fields"]
        )
        return cols

    def streamReader(self, schema):
        return IcebergStreamReader(self.options["location"])


def register(spark) -> None:
    """Register the source on a session:
    ``iceberg_stream.register(spark)`` then
    ``spark.readStream.format("htrtf_iceberg")``."""
    spark.dataSource.register(IcebergIncrementalSource)
