"""CLI entry point — `python -m hadoop_distexec_spark SRC... DST CMD`,
mirroring the reference tool's command line (reference README.md:9-10:
`hadoop distexec /source /destination cat`).

Argument rules follow Arguments.valueOf (reference DistExec.java:256-296):
positional args are sources, then destination, then the exec command (last
arg = cmd, second-to-last = dst, rest = srcs); flags `-m` (max tasks,
DistExec.java:270-279) and `-redirectErrorToOut` (DistExec.java:71,79-88 —
parsed-but-dead there, functional here).

Exit codes mirror run() (DistExec.java:350-374):
  0 success, -1 usage, -2 duplicate destinations, -3 invalid input,
  -999 anything else.
"""

from __future__ import annotations

import argparse
import sys

from hadoop_distexec_spark.errors import DistExecError, DuplicationError, InvalidInputError, UsageError


def parse_args(argv: list[str]) -> argparse.Namespace:
    ap = argparse.ArgumentParser(
        prog="distexec",
        description="Distributed per-file command execution on Spark "
        "(positional: SRC... DST CMD, like the reference tool).",
    )
    ap.add_argument("-m", type=int, default=None, metavar="N", help="max number of tasks")
    ap.add_argument(
        "-redirectErrorToOut",
        action="store_true",
        dest="redirect_err_to_out",
        help="merge child stderr into stdout instead of .stderr side files",
    )
    # -update must stay a bare flag (DistCp grammar: `distexec -update SRC
    # DST CMD`) — an optional-value form (nargs='?') would greedily consume
    # the first positional as its value. The hash mode rides a separate
    # -updatemode flag.
    ap.add_argument(
        "-update",
        action="store_true",
        dest="update_flag",
        help="skip up-to-date destinations (see -updatemode)",
    )
    ap.add_argument(
        "-updatemode",
        default="mtime",
        choices=["mtime", "hash"],
        help="how -update decides freshness: mtime (default) or "
        "content-hash compare against the previous run's _distexec_state",
    )
    ap.add_argument(
        "-delete",
        action="store_true",
        dest="delete",
        help="after the run, delete dst entries no source maps to "
        "(DistCp -delete heritage; implies the -update layout)",
    )
    ap.add_argument(
        "-f",
        dest="uri_list",
        default=None,
        metavar="URILIST",
        help="read source paths (one per line) from this file instead of "
        "positional SRC args — DistCp's -f, dead code in the reference "
        "(fetchFileList, DistExec.java:188-204), functional here",
    )
    ap.add_argument(
        "-p",
        action="store_true",
        dest="preserve",
        help="preserve source permission bits + mtime on destinations "
        "(DistCp -p heritage, finalize pass)",
    )
    ap.add_argument(
        "-filelimit",
        type=int,
        default=None,
        metavar="N",
        help="copy at most the first N files (DistCp heritage)",
    )
    ap.add_argument(
        "-sizelimit",
        type=int,
        default=None,
        metavar="BYTES",
        help="copy at most the first BYTES of input (DistCp heritage)",
    )
    ap.add_argument(
        "-timeout",
        type=float,
        default=None,
        dest="cmd_timeout",
        metavar="SEC",
        help="per-file command timeout in seconds (straggler guard; expired files FAIL)",
    )
    ap.add_argument("paths", nargs="*", help="SRC... DST CMD")
    ns = ap.parse_args(argv)
    if ns.uri_list is not None:
        if len(ns.paths) < 2:
            raise UsageError("need DST CMD with -f")
        from hadoop_distexec_spark.fs import resolve_fs

        with resolve_fs(ns.uri_list).open(ns.uri_list, "rb") as fh:
            ns.srcs = [ln.strip() for ln in fh.read().decode("utf-8").splitlines() if ln.strip()]
        if not ns.srcs:
            raise UsageError(f"-f {ns.uri_list}: no source paths in file")
        ns.srcs += ns.paths[:-2]  # positionals may supplement the list
    else:
        if len(ns.paths) < 3:
            raise UsageError("need at least SRC DST CMD")
        ns.srcs = ns.paths[:-2]
    ns.dst = ns.paths[-2]
    ns.cmd = ns.paths[-1]
    ns.update = ns.updatemode if ns.update_flag else False
    return ns


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    try:
        ns = parse_args(argv)
    except UsageError as e:
        print(f"usage error: {e}", file=sys.stderr)
        return -1
    try:
        from hadoop_distexec_spark.pipe.executor import distexec, metrics
        from hadoop_distexec_spark.session import get_spark

        spark = get_spark("distexec-cli")
        # the run's root rule depends on whether dst existed BEFORE the run
        # (DistExec.java:545,553); capture it now so a later -delete sync
        # rebases against the same layout. Resolve through the FS layer —
        # os.path.exists on a remote URI is always False and would make
        # -delete sync against the wrong layout (deleting fresh outputs).
        from hadoop_distexec_spark.fs import resolve_fs

        dst_preexisted = resolve_fs(ns.dst).exists(ns.dst)
        results = distexec(
            spark,
            ns.srcs,
            ns.dst,
            ns.cmd,
            redirect_err_to_out=ns.redirect_err_to_out,
            n_tasks=ns.m,
            update=ns.update,
            cmd_timeout=ns.cmd_timeout,
            filelimit=ns.filelimit,
            sizelimit=ns.sizelimit,
            preserve=ns.preserve,
        )
        m = metrics(results).collect()[0]
        n_deleted = 0
        if ns.delete:
            from hadoop_distexec_spark.pipe.sync import sync_deletes

            n_deleted = sync_deletes(
                spark,
                ns.srcs,
                ns.dst,
                contents_into_dst=(ns.update or not dst_preexisted),
            ).count()
        print(
            f"executed={m['executed']} fail={m['fail']} skipped={m['skipped']} "
            f"bytes_executed={m['bytes_executed']} bytes_written={m['bytes_written']}"
            + (f" deleted={n_deleted}" if ns.delete else "")
        )
        return 0
    except DuplicationError as e:
        print(f"duplication error: {e}", file=sys.stderr)
        return -2
    except InvalidInputError as e:
        print(f"invalid input: {e}", file=sys.stderr)
        return -3
    except DistExecError as e:
        print(f"error: {e}", file=sys.stderr)
        return -999
    except Exception as e:  # -999 catch-all, like the reference run()
        print(f"error: {e}", file=sys.stderr)
        return -999


if __name__ == "__main__":
    sys.exit(main())
