"""Envelope codecs: JSON wire format and base64/hex transcoding.

Reference analogues: Kafka JSON marshal/unmarshal (S5/S6,
transactions-producer/external/kafka/client.go:28-65) and the hex→base64
field transcode during archive scans (F8,
transactions-producer/external/archiver/client.go:56-85).  All built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import CHANGE_EVENT_SCHEMA


def to_wire(df: DataFrame, key_col: str = "conv_id") -> DataFrame:
    """Rows → (key, value) JSON records, the Kafka producer projection.
    The key is the routing attribute (reference: LE-uint32 tick bytes;
    ours: conv_id bytes) — partition-by-key on the ordering attribute."""
    return df.select(
        F.col(key_col).cast("binary").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def from_wire(df: DataFrame, schema=None) -> DataFrame:
    """(key, value) JSON records → typed rows, the consumer projection."""
    schema = schema or CHANGE_EVENT_SCHEMA
    return df.select(F.from_json(F.col("value").cast("string"), schema).alias("r")).select("r.*")


def le_uint32_key(col: Column) -> Column:
    """4-byte little-endian uint32 key bytes — bit-exact parity with the
    reference producer's Kafka record key
    (transactions-producer/external/kafka/client.go:73-79:
    binary.LittleEndian.PutUint32(key, tx.TickNumber)).

    Built-ins only: value → 8-hex-digit big-endian string → byte-swapped to
    LE digit pairs → unhex to binary.
    """
    hx = F.lpad(F.hex(col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))), 8, "0")
    le = F.concat(
        F.substring(hx, 7, 2), F.substring(hx, 5, 2),
        F.substring(hx, 3, 2), F.substring(hx, 1, 2),
    )
    return F.unhex(le)


def le_uint32_value(col: Column) -> Column:
    """Inverse of `le_uint32_key`: 4 LE bytes → long (consumer side)."""
    hx = F.hex(col)
    be = F.concat(
        F.substring(hx, 7, 2), F.substring(hx, 5, 2),
        F.substring(hx, 3, 2), F.substring(hx, 1, 2),
    )
    return F.conv(be, 16, 10).cast("long")


def to_wire_kafka(df: DataFrame, key_num_col: str) -> DataFrame:
    """Rows → Kafka-shaped (key binary LE-uint32, value JSON string) records,
    matching the reference producer's record layout exactly."""
    return df.select(
        le_uint32_key(F.col(key_num_col)).alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def hex_to_base64(col: Column) -> Column:
    """F8: hex string → bytes → base64 string (vectorized built-ins)."""
    return F.base64(F.unhex(col))


def base64_to_hex(col: Column) -> Column:
    return F.lower(F.hex(F.unbase64(col)))
