"""Stage checkpointing with lineage + resume.

Every materialized stage writes:
    <dir>/<stage>/           parquet (per-partition files + _SUCCESS)
    <dir>/<stage>.lineage.json   {stage, config_hash, rows, n_files,
                                  wall_ms, ts}
    <dir>/lineage.jsonl          append-only run log (the lineage table)

Resume rule (the prefixCache idea at pipeline scale,
demos/compare.html:562-601): a stage is reused iff its _SUCCESS marker
exists AND its recorded config_hash matches the current run's — config
drift forces recompute, which is what makes "recall at the same
shingle/signature config" machine-checkable (SURVEY.md §1 schema
system).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class StageRunner:
    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None,
        config_hash: str,
        resume: bool = True,
    ):
        self.spark = spark
        self.dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.config_hash = config_hash
        self.resume = resume
        self.metrics: dict[str, dict] = {}
        if self.dir:
            self.dir.mkdir(parents=True, exist_ok=True)

    def _stage_meta(self, name: str) -> dict | None:
        meta_p = self.dir / f"{name}.lineage.json"
        if not meta_p.exists():
            return None
        try:
            return json.loads(meta_p.read_text())
        except (json.JSONDecodeError, OSError):
            return None

    def materialize(self, name: str, df_fn) -> DataFrame:
        """Compute-or-reuse a stage; records lineage either way."""
        if self.dir is None:
            df = df_fn()
            return df

        path = self.dir / name
        meta = self._stage_meta(name)
        if (
            self.resume
            and meta is not None
            and meta.get("config_hash") == self.config_hash
            and (path / "_SUCCESS").exists()
        ):
            self.metrics[name] = {**meta, "resumed": True}
            self._log({**meta, "resumed": True, "ts": time.time()})
            return self.spark.read.parquet(str(path))

        t0 = time.time()
        df = df_fn()
        df.write.mode("overwrite").parquet(str(path))
        out = self.spark.read.parquet(str(path))
        partitions = _partition_lineage(path)
        meta = {
            "stage": name,
            "config_hash": self.config_hash,
            "rows": sum(p["rows"] for p in partitions),
            "n_files": len(partitions),
            "partitions": partitions,
            "wall_ms": int((time.time() - t0) * 1000),
            "ts": time.time(),
            "resumed": False,
        }
        (self.dir / f"{name}.lineage.json").write_text(json.dumps(meta))
        self._log(meta)
        self.metrics[name] = meta
        return out

    def _log(self, rec: dict) -> None:
        with open(self.dir / "lineage.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")

    def write_metrics_table(self) -> None:
        """Materialize the run's stage metrics as a parquet table
        (<dir>/metrics_table) — the queryable metrics table the north
        rule asks for, written without a Spark job."""
        if self.dir is None or not self.metrics:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [
            {
                "stage": name,
                "config_hash": m.get("config_hash", self.config_hash),
                "rows": m.get("rows", 0),
                "n_files": m.get("n_files", 0),
                "wall_ms": m.get("wall_ms", 0),
                "resumed": bool(m.get("resumed", False)),
                "ts": float(m.get("ts", time.time())),
            }
            for name, m in self.metrics.items()
        ]
        out = self.dir / "metrics_table"
        out.mkdir(exist_ok=True)
        pq.write_table(pa.Table.from_pylist(rows), out / "metrics.parquet")


def _partition_lineage(path: Path) -> list[dict]:
    """Per-partition (per output file) row counts from parquet footers
    — free metadata reads, no data scan."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(path.glob("part-*")):
        try:
            out.append({"file": f.name, "rows": pq.ParquetFile(f).metadata.num_rows})
        except Exception:
            out.append({"file": f.name, "rows": -1})
    return out
