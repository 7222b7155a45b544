"""Engine exceptions.

Reference parity: src/plugins/common/exceptions.py:1-10 defines
InvalidResponseError (malformed feed), InvalidSource (state schema
violation) and InvalidCredentials (fail-fast config validation).
"""


class EngineError(Exception):
    """Base class for engine errors."""


class InvalidResponseError(EngineError):
    """Raised when an upstream feed response is malformed.

    Reference: raised at src/plugins/scripts/opensky/transformers.py:40-47
    and src/plugins/scripts/opensky/client.py:33-35.
    """


class InvalidSource(EngineError):
    """Raised when a persisted state table lacks required columns.

    Reference: raised at src/plugins/scripts/opensky/transformers.py:64-65.
    """


class InvalidCredentials(EngineError):
    """Raised at session-build time on missing/invalid credentials.

    Reference: src/plugins/common/s3.py:50,68, complete_flights/db.py:31-32.
    """
