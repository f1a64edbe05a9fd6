"""Engine-independent error taxonomy (reference parity).

The reference translates backend error codes into a typed, database-
independent exception vocabulary so callers can handle failure classes
programmatically instead of string-matching messages
(`/root/reference/src/minerva/db/error.py:8-64`, mapping at `:66-80`,
exercised by `integration_tests/storage/trend/test_error.py`).  This
module is the Spark-substrate twin: the same names, raised by the
loader/store paths directly (there is no SQLSTATE layer to translate —
the conditions are detected where they arise), plus a translator for
the Spark ``AnalysisException`` conditions that map onto the taxonomy.

Subclass bases are chosen for backward compatibility with the generic
exceptions the engine raised before the taxonomy existed (callers that
caught ``ValueError``/``KeyError`` keep working); new code should catch
the typed classes.
"""

from __future__ import annotations


class MinervaError(Exception):
    """Root of the engine's typed error vocabulary."""


class NoSuchTable(MinervaError, KeyError):
    """A referenced trend/attribute store (or part) does not exist
    (reference ``UNDEFINED_TABLE`` → ``NoSuchTable``)."""

    def __str__(self) -> str:  # KeyError quotes its repr; keep prose
        return Exception.__str__(self)


class NoSuchColumnError(MinervaError, ValueError):
    """A package carries columns the target store never declared and
    the load policy is 'stop' (reference ``UNDEFINED_COLUMN``)."""


class UniqueViolation(MinervaError, ValueError):
    """A batch violates the (entity_id, timestamp) primary key — i.e.
    duplicate keys survived where the caller promised uniqueness
    (reference ``UNIQUE_VIOLATION``)."""


class DataTypeMismatch(MinervaError, ValueError):
    """Incompatible column types that no lattice widen reconciles
    (reference ``DATATYPE_MISMATCH`` / value-representation errors)."""


class ExistsError(MinervaError, FileExistsError):
    """Creating something that already exists (reference
    ``ExistsError`` / ``DuplicateTable``).  Subclasses
    ``FileExistsError`` because the YAML-catalog admin paths already
    raised that; existing ``except FileExistsError`` sites keep
    working."""


class LockNotAvailable(MinervaError, RuntimeError):
    """A required store lease is held by another writer and the
    acquisition timeout elapsed (reference ``LOCK_NOT_AVAILABLE``;
    the deadlock-retry loop at
    `/root/reference/src/minerva/commands/trend_store.py:1191-1196`
    is the analogous contention handler)."""


def malformed_payload_guard(fn):
    """Dirty-corpus rule shared by the binary codecs (r15): a
    truncated or garbage structure must surface as ``ValueError`` —
    the codec error-policy contract every ``on_error='skip'`` scan
    relies on — never as a raw struct/zip/XML/Unicode error that
    kills the whole Spark task.  ``ValueError`` subclasses (e.g.
    ``offcrypto.WrongPasswordError``) pass through untouched."""
    import struct as _struct
    import zipfile as _zipfile
    import zlib as _zlib
    from functools import wraps

    @wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ValueError:
            raise
        except (_struct.error, IndexError, KeyError, TypeError,
                OverflowError, SyntaxError, UnicodeDecodeError,
                EOFError, _zipfile.BadZipFile, _zlib.error) as e:
            raise ValueError(
                f"{fn.__name__}: malformed payload "
                f"({type(e).__name__}: {e})"
            ) from e

    return wrapped


def translate_analysis_exceptions(f):
    """Decorator twin of :func:`translate_analysis_exception` (the
    reference decorates DB-touching functions the same way,
    `db/error.py:83-92`): any AnalysisException escaping ``f`` is
    re-raised as its typed equivalent."""
    from functools import wraps

    @wraps(f)
    def wrapped(*args, **kwargs):
        try:
            return f(*args, **kwargs)
        except Exception as exc:
            if type(exc).__name__ == "AnalysisException" or hasattr(
                exc, "getErrorClass"
            ):
                translated = translate_analysis_exception(exc)
                if translated is not exc:
                    raise translated from exc
            raise

    return wrapped


def translate_analysis_exception(exc: Exception) -> Exception:
    """Map a Spark ``AnalysisException`` onto the taxonomy where its
    error class corresponds to one (the analog of the reference's
    SQLSTATE mapping); anything unrecognized passes through unchanged.
    """
    cond = getattr(exc, "getErrorClass", lambda: None)() or ""
    msg = str(exc)
    if cond.startswith("TABLE_OR_VIEW_NOT_FOUND") or "PATH_NOT_FOUND" in cond:
        return NoSuchTable(msg)
    if cond.startswith("UNRESOLVED_COLUMN"):
        return NoSuchColumnError(msg)
    if cond.startswith("CANNOT_UP_CAST") or cond.startswith("DATATYPE_MISMATCH"):
        return DataTypeMismatch(msg)
    if cond.startswith("TABLE_OR_VIEW_ALREADY_EXISTS"):
        return ExistsError(msg)
    return exc
