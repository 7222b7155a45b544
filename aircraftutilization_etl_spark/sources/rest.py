"""REST / HTTP-CSV ingest — the OpenSky feed endpoints as typed sources.

Reference S1 (src/plugins/scripts/opensky/client.py:20-35): GET
/api/states/all with basic auth, 5 s timeout, logs X-Rate-Limit-Remaining,
raises InvalidResponseError on non-200. Reference S2
(opensky/transformers.py:37-58): the JSON ``states`` array → 17-column
table, KeyError/ValueError → InvalidResponseError. Reference S3
(client.py:37-41): the ~500k-row aircraft-database CSV.

Spark has no native REST source; the poll is driver-side (the payload is
one ~10⁴-row snapshot — not a distributable read) and becomes a DataFrame
via createDataFrame with the explicit schema. The streaming path wraps the
same poll in a rate-limited generator feeding the micro-batch pipeline.
``requests`` is import-gated: the engine works without it (tests inject
responses).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

from ..errors import InvalidCredentials, InvalidResponseError
from ..schemas import STATES_SCHEMA

try:  # pragma: no cover - exercised only when requests is installed
    import requests
except ImportError:  # pragma: no cover
    requests = None

logger = logging.getLogger(__name__)

OPENSKY_STATES_URL = "https://opensky-network.org/api/states/all"
OPENSKY_AIRCRAFT_DB_URL = (
    "https://opensky-network.org/datasets/metadata/aircraftDatabase.csv"
)
REQUEST_TIMEOUT_SECONDS = 5  # reference client.py:25


class OpenSkyClient:
    """Driver-side OpenSky API client (reference client.py:8-41)."""

    def __init__(self, username: str | None = None, password: str | None = None):
        if (username is None) != (password is None):
            raise InvalidCredentials("username and password must be set together")
        self.auth = (username, password) if username else None

    def get_states(self) -> dict:
        if requests is None:
            raise InvalidResponseError("requests not available in this environment")
        response = requests.get(
            OPENSKY_STATES_URL, auth=self.auth, timeout=REQUEST_TIMEOUT_SECONDS
        )
        remaining = response.headers.get("X-Rate-Limit-Remaining")
        logger.info("OpenSky rate limit remaining: %s", remaining)
        if response.status_code != 200:
            raise InvalidResponseError(f"status {response.status_code}")
        return response.json()


def states_response_to_df(spark: SparkSession, payload: dict) -> DataFrame:
    """S2 — JSON→table normalization with shape validation.

    The 17-element state vectors become typed rows; a missing ``states``
    key or wrong-arity rows raise InvalidResponseError (reference
    opensky/transformers.py:40-47).
    """
    try:
        states = payload["states"]
    except (KeyError, TypeError) as exc:
        raise InvalidResponseError(str(exc)) from exc
    n_cols = len(STATES_SCHEMA.fields)
    rows = []
    for vector in states or []:
        if len(vector) != n_cols:
            raise InvalidResponseError(
                f"state vector arity {len(vector)} != {n_cols}"
            )
        rows.append(tuple(vector))
    return spark.createDataFrame(rows, STATES_SCHEMA)


def read_aircraft_database_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3 — aircraft-database CSV scan (staged locally or on object store).

    The one inferred-schema ingest in the system (reference client.py:40
    uses pd.read_csv(url)); the projection to the 7 dimension columns
    happens in operators.flight.project_metadata.
    """
    return spark.read.option("header", True).csv(path)
