"""Line-oriented pipe transform over a DataFrame column — the RDD.pipe tier
of the pipe-operator family (SURVEY.md §2.5 "UDF/UDAF surface": shell pipe,
Python UDF, pandas UDF — same transform contract, three execution tiers).

Where ``distexec`` pipes whole *files* (reference ExecFilesMapper.java:82-154),
``pipe_rows`` pipes *rows*: one subprocess per partition, each input row's
column value written as one stdin line, each stdout line zipped back to its
row (the command must be a 1:1 line filter — tr/sed/awk-style). Bytes
stream through the child; only one line is in flight per row, so memory is
O(1) per partition regardless of partition size.

Scale: one process per partition (not per row), partition count = task
parallelism, no shuffle at all — the transform is a narrow map.
"""

from __future__ import annotations

import subprocess
import threading
from typing import Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import types as T

from hadoop_distexec_spark.pipe.cmdline import exit_ok, tokenize


def pipe_rows(df: DataFrame, cmd: str | list[str], input_col: str, output_col: str = "piped") -> DataFrame:
    """Pipe ``input_col`` of every row through ``cmd`` (a 1:1 line filter);
    returns df's columns plus ``output_col``."""
    argv = tokenize(cmd)
    in_schema = df.schema
    out_schema = T.StructType([*in_schema.fields, T.StructField(output_col, T.StringType(), True)])
    field_names = [f.name for f in in_schema.fields]

    def run_partition(rows: Iterator[Row]) -> Iterator[Row]:
        rows = iter(rows)
        first = next(rows, None)
        if first is None:
            return
        proc = subprocess.Popen(
            argv,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            bufsize=1,  # line buffered: keeps writer/reader in lockstep
        )
        pending: list[Row] = []
        lock = threading.Lock()
        writer_error: list[Exception] = []

        def _chain(head, rest):
            yield head
            yield from rest

        def writer():
            # stdin MUST close on every path — a dead writer with stdin
            # open would leave the child waiting for EOF and the reader
            # loop below blocked forever.
            try:
                for row in _chain(first, rows):
                    with lock:
                        pending.append(row)
                    val = row[input_col]
                    proc.stdin.write(("" if val is None else str(val)) + "\n")
            except BrokenPipeError:
                pass
            except Exception as e:  # surfaced after the reader drains
                writer_error.append(e)
            finally:
                try:
                    proc.stdin.close()
                except Exception:
                    pass

        t = threading.Thread(target=writer, daemon=True)
        t.start()
        for line in proc.stdout:
            with lock:
                row = pending.pop(0)
            yield Row(**{**{n: row[n] for n in field_names}, output_col: line.rstrip("\n")})
        t.join()
        rc = proc.wait()
        if writer_error:
            raise RuntimeError(f"pipe input failed: {writer_error[0]!r}") from writer_error[0]
        if not exit_ok(argv, rc):
            raise RuntimeError(f"pipe command {argv} exited {rc}")
        with lock:
            if pending:
                raise RuntimeError(
                    f"pipe command {argv} is not a 1:1 line filter: "
                    f"{len(pending)} input lines produced no output"
                )

    return df.sparkSession.createDataFrame(df.rdd.mapPartitions(run_partition), out_schema)
