"""Readers/writers mirroring Towhee's data_source/ann_insert surface
(towhee/runtime/hub_ops/data_source.py, ann_insert.py) on Spark-native
connectors, plus the Iceberg-or-parquet table abstraction.

Iceberg is the engine's canonical table format (north_rule); the sandbox has
no iceberg-spark-runtime jar, so one writer interface gates on availability
and falls back to parquet with the identical layout — callers never branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """Read an engine table: Iceberg identifier (catalog.db.tbl) when the
    runtime is present, else a parquet path."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_table(df: DataFrame, location: str, mode: str = "overwrite") -> None:
    """Write an engine table; ``mode`` carries DataFrameWriter semantics on
    BOTH backends (overwrite / append / error[ifexists] / ignore) — the
    Iceberg branch previously collapsed every non-overwrite mode into
    append, silently discarding error/ignore semantics."""
    if "/" not in location and iceberg_available(df.sparkSession):
        w = df.writeTo(location)
        if mode == "overwrite":
            w.createOrReplace()
        elif mode == "append":
            w.append()
        elif mode in ("error", "errorifexists"):
            w.create()  # Iceberg create raises if the table exists
        elif mode == "ignore":
            try:
                w.create()
            except Exception as e:  # noqa: BLE001
                # 'ignore' only suppresses table-already-exists — a real
                # failure (permissions, schema, connectivity) must surface
                # (advisor finding r3)
                msg = str(e)
                if "AlreadyExists" not in msg and "already exists" not in msg.lower():
                    raise
        else:
            raise ValueError(f"unknown write mode {mode!r}")
        return
    df.write.mode(mode).parquet(location)


# -- Towhee data_source parity (data_source.py:25-117) ----------------------

def read_glob(spark: SparkSession, path: str, pattern: str = "*", binary: bool = False) -> DataFrame:
    """data_source.glob → binaryFile/text scan with pathGlobFilter (file
    listing distributed, contents never driver-side)."""
    fmt = "binaryFile" if binary else "text"
    return spark.read.format(fmt).option("pathGlobFilter", pattern).load(path)


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    """data_source.csv_reader → native CSV scan with schema inference off by
    default (pass schema= for production stability)."""
    opts = {"header": "true", **{k: str(v) for k, v in options.items()}}
    return spark.read.options(**opts).csv(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    **options,
) -> DataFrame:
    """data_source.sql → spark.read.jdbc; Catalyst pushes filters/columns to
    the database (the reference's cols/where/limit args come for free).
    ``predicates``: one WHERE fragment per partition → parallel reads."""
    if predicates:
        props = {k: str(v) for k, v in options.items()}
        return spark.read.jdbc(url=url, table=table, predicates=list(predicates),
                               properties=props)
    reader: DataFrameReader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()


# -- ann_insert parity (ann_insert.py:24-103) --------------------------------

def write_vectors(df: DataFrame, location: str, id_col: str = "vec_id",
                  vec_col: str = "embedding", mode: str = "overwrite") -> None:
    """Vector sink: persist (id, embedding[, metadata...]) as an engine table
    — the Iceberg/parquet analogue of faiss/milvus insert; downstream
    similarity search reads it back with towhee_spark.functions.similarity."""
    cols = [id_col, vec_col] + [c for c in df.columns if c not in (id_col, vec_col)]
    write_table(df.select(*cols), location, mode=mode)
