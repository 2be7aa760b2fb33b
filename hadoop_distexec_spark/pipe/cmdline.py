"""Command-line handling for the pipe executor.

The reference tokenizes the exec command with an Ant-derived FSM
(reference CommandLineUtil.java:19-78 — spaces split tokens except inside
single/double quotes; unbalanced quotes raise). Python's ``shlex`` with
``posix=True`` has the same observable semantics for that grammar.

Exit-code policy (reference Executor.java:33-35,50-51): the grep family may
exit 1 — "no lines matched" — without it being an error; everything else
must exit 0.
"""

from __future__ import annotations

import os
import shlex

GREP_FAMILY = {"grep", "egrep", "fgrep", "zgrep", "zegrep", "zfgrep"}


def tokenize(cmd: str | list[str]) -> list[str]:
    if isinstance(cmd, list):
        return list(cmd)
    try:
        toks = shlex.split(cmd, posix=True)
    except ValueError as e:  # unbalanced quotes -> error, like the reference
        raise ValueError(f"unbalanced quotes in {cmd!r}: {e}") from e
    if not toks:
        raise ValueError("empty command")
    return toks


def exit_ok(argv: list[str], returncode: int) -> bool:
    """True when the exit code is acceptable for this command."""
    if returncode == 0:
        return True
    prog = os.path.basename(argv[0])
    return prog in GREP_FAMILY and returncode == 1
