"""Engine error types, mirroring the reference's exit-code taxonomy
(reference src/main/java/com/kadwa/hadoop/DistExec.java:350-374:
-1 usage, -2 duplication, -3 remote/invalid-input, -999 other)."""

from __future__ import annotations


class DistExecError(Exception):
    """Base class; exit_code mirrors the reference CLI mapping."""

    exit_code = -999


class UsageError(DistExecError):
    exit_code = -1


class DuplicationException(DistExecError):
    """Two sources map to the same destination
    (reference DistExec.java:647-673, 688-693)."""

    exit_code = -2


# Alias with the spelling used in the public API.
DuplicationError = DuplicationException


class InvalidInputError(DistExecError):
    """A source path does not exist; all misses are accumulated before
    raising (reference DistExec.java:209-226)."""

    exit_code = -3

    def __init__(self, missing: list[str]):
        self.missing = list(missing)
        super().__init__(f"input paths do not exist: {', '.join(self.missing)}")
