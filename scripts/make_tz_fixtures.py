"""Regenerate tests/fixtures/tz_<zone>.orc — genuine ORC-Java-written
files whose stripe footers carry a NON-UTC writerTimezone.

Apache's two writers disagree here: ORC-C++ (pyarrow.orc) always stamps
GMT, but plain ORC-Java/Hive under default config
(orc.use.utc.timestamp=false) stamps the JVM zone and rebases stored
seconds on 2015-01-01 00:00:00 *wall clock in that zone* — the layout
`orc_read.py` must undo. Spark's own ORC writes are UTC, so the only
way to make these files in-sandbox is to drive the ORC-Java writer
bundled in Spark's jars directly over py4j, one JVM per zone (the base
epoch latches the JVM default TimeZone).

Both Apache readers restore the original wall clocks from these files
(ORC-Java read back in the writer zone; ORC-C++/pyarrow converting
writer->reader): that is the expected output `tests/test_orc_read.py`
pins, byte-for-byte, against our reader.

Run: python scripts/make_tz_fixtures.py   (writes into tests/fixtures/)
"""

from __future__ import annotations

import os
import sys

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

ZONES = ["America/Los_Angeles", "Asia/Kolkata", "Australia/Sydney"]

# wall clocks chosen to cross every conversion hazard: DST spring-forward
# boundary (US 2020-03-08, AU 2020-10-04), fall-back ambiguous hour
# (US 2020-11-01), pre-Unix-epoch, pre-2015-base, sub-second nanos, and
# the 2015 base instant itself
WALL = [
    "2015-06-01 12:00:00.0",
    "2014-12-31 23:59:59.5",
    "2020-03-08 01:59:59.123456789",
    "2020-03-08 03:00:00.0",
    "2020-11-01 01:30:00.0",
    "1969-12-31 15:59:59.0",
    "1960-02-29 06:00:00.25",
    "2015-01-01 00:00:00.0",
]


def write_one(zone: str, out_path: str) -> None:
    from py4j.java_gateway import get_field, set_field
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[1]")
        .appName(f"tz-fixture-{zone}")
        .config("spark.driver.extraJavaOptions", f"-Duser.timezone={zone}")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        jvm = spark._jvm
        assert jvm.java.util.TimeZone.getDefault().getID() == zone
        conf = jvm.org.apache.hadoop.conf.Configuration()
        try:
            os.remove(out_path)
        except FileNotFoundError:
            pass
        path = jvm.org.apache.hadoop.fs.Path(out_path)
        schema = jvm.org.apache.orc.TypeDescription.fromString(
            "struct<ts:timestamp>"
        )
        writer = jvm.org.apache.orc.OrcFile.createWriter(
            path, jvm.org.apache.orc.OrcFile.writerOptions(conf).setSchema(
                schema
            )
        )
        batch = schema.createRowBatch()
        tsv = get_field(batch, "cols")[0]
        for i, wall in enumerate(WALL):
            tsv.set(i, jvm.java.sql.Timestamp.valueOf(wall))
        set_field(batch, "size", len(WALL))
        writer.addRowBatch(batch)
        writer.close()
        # hadoop LocalFileSystem leaves a .crc sibling; drop it
        crc = os.path.join(
            os.path.dirname(out_path), "." + os.path.basename(out_path) + ".crc"
        )
        try:
            os.remove(crc)
        except FileNotFoundError:
            pass
    finally:
        spark.stop()


def main() -> None:
    import subprocess

    for zone in ZONES:
        name = "tz_" + zone.split("/")[-1].lower() + ".orc"
        out = os.path.abspath(os.path.join(FIXDIR, name))
        # one subprocess per zone: spark.stop() keeps the py4j JVM (and
        # its latched default TimeZone) alive for the whole process
        subprocess.run(
            [sys.executable, __file__, "--one", zone, out], check=True
        )
        print(f"{zone} -> {out} ({os.path.getsize(out)} B)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 4 and sys.argv[1] == "--one":
        write_one(sys.argv[2], sys.argv[3])
    else:
        sys.exit(main())
