"""REST/GraphQL API source (driver-side I/O → distributed DataFrame).

Parity target: ``APIConnector`` (reference:
src/connectors/api_connector.py:93-308) — pagination (offset/page/cursor),
auth (basic/bearer/api_key/oauth2 client-credentials), retry on 429/5xx,
dot-notation data_path extraction, 100-page cap, per-record POST sink,
GraphQL queries.

API I/O is inherently driver-side (as in the reference); results land in
a DataFrame immediately so everything downstream is distributed. The
``requests`` dependency is import-gated — absent in this container, the
connector raises cleanly at call time, and the pagination/extraction
logic is unit-tested with an injected fake transport.
"""

from __future__ import annotations

import time
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

MAX_PAGES = 100  # reference cap: api_connector.py:112-135


def extract_data_path(payload: Any, data_path: str | None) -> list[dict]:
    """Dot-notation extraction, e.g. ``"data.items"`` → payload["data"]["items"]."""
    node = payload
    if data_path:
        for part in data_path.split("."):
            if not isinstance(node, dict) or part not in node:
                return []
            node = node[part]
    if isinstance(node, list):
        return node
    return [node] if isinstance(node, dict) else []


class APIConnector:
    def __init__(
        self,
        spark: SparkSession,
        conn_config: dict[str, Any],
        transport: Callable[..., Any] | None = None,
    ):
        self.spark = spark
        self.cfg = conn_config
        self._transport = transport  # injectable for tests; defaults to requests

    # ------------------------------------------------------------ plumbing

    def _headers(self) -> dict[str, str]:
        """Auth headers: basic / bearer / api_key / oauth2
        (reference: api_connector.py:104-134)."""
        auth = self.cfg.get("auth", {}) or {}
        kind = auth.get("type")
        if kind == "basic":
            import base64

            creds = f"{auth.get('username', '')}:{auth.get('password', '')}"
            token = base64.b64encode(creds.encode()).decode()
            return {"Authorization": f"Basic {token}"}
        if kind == "bearer":
            return {"Authorization": f"Bearer {auth['token']}"}
        if kind == "api_key":
            return {auth.get("header", "X-API-Key"): auth["key"]}
        if kind == "oauth2":
            return {"Authorization": f"Bearer {self._oauth2_token()}"}
        return {}

    def _oauth2_token(self) -> str:
        """OAuth2 access token: a pre-issued ``access_token`` wins
        (reference parity); otherwise the client-credentials grant runs
        against ``token_url`` and the token is cached until ~expiry."""
        auth = self.cfg.get("auth", {}) or {}
        if auth.get("access_token"):
            return auth["access_token"]
        now = time.monotonic()
        cached = getattr(self, "_oauth_cache", None)
        if cached and now < cached[1]:
            return cached[0]
        payload = self._request(
            "POST",
            auth["token_url"],
            data={
                "grant_type": "client_credentials",
                "client_id": auth.get("client_id"),
                "client_secret": auth.get("client_secret"),
                **({"scope": auth["scope"]} if auth.get("scope") else {}),
            },
        )
        token = payload["access_token"]
        # refresh 60s before expiry; default 1h when the server omits it
        ttl = float(payload.get("expires_in", 3600)) - 60.0
        self._oauth_cache = (token, now + max(ttl, 0.0))
        return token

    def _request(self, method: str, url: str, **kw) -> Any:
        if self._transport is not None:
            return self._transport(method, url, **kw)
        try:
            import requests  # noqa: PLC0415
        except ImportError as e:
            raise RuntimeError("requests not installed; inject a transport") from e
        for attempt in range(5):
            resp = requests.request(method, url, timeout=30, **kw)
            if resp.status_code == 429 or resp.status_code >= 500:
                time.sleep(min(2**attempt, 30))
                continue
            resp.raise_for_status()
            return resp.json()
        resp.raise_for_status()

    # ----------------------------------------------------------------- api

    def read(
        self,
        endpoint: str,
        params: dict[str, Any] | None = None,
        method: str = "GET",
        data_path: str | None = None,
        pagination: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Paginated read → DataFrame. pagination: {"type": offset|page|cursor, ...}."""
        params = dict(params or {})
        records: list[dict] = []
        pg = pagination or {}
        ptype = pg.get("type")
        cursor = None
        for page in range(MAX_PAGES):
            if ptype == "offset":
                params[pg.get("offset_param", "offset")] = page * pg.get("page_size", 100)
                params[pg.get("limit_param", "limit")] = pg.get("page_size", 100)
            elif ptype == "page":
                params[pg.get("page_param", "page")] = page + 1
            elif ptype == "cursor" and cursor:
                params[pg.get("cursor_param", "cursor")] = cursor
            payload = self._request(method, endpoint, params=params, headers=self._headers())
            batch = extract_data_path(payload, data_path)
            records.extend(batch)
            if ptype is None or not batch:
                break
            if ptype == "cursor":
                cursor = payload.get(pg.get("next_cursor_field", "next_cursor"))
                if not cursor:
                    break
            elif len(batch) < pg.get("page_size", 100) and ptype == "offset":
                break
        if not records:
            return self.spark.createDataFrame([], schema="dummy string").limit(0)
        return self.spark.createDataFrame(records)

    def write(self, df: DataFrame, endpoint: str, method: str = "POST") -> int:
        """Per-record POST/PUT/PATCH; returns success count.

        Iterates with ``toLocalIterator`` so only one partition is resident
        on the driver at a time.
        """
        ok = 0
        for row in df.toLocalIterator():
            self._request(method, endpoint, json=row.asDict(recursive=True),
                          headers=self._headers())
            ok += 1
        return ok

    def graphql_query(self, endpoint: str, query: str,
                      variables: dict | None = None, data_path: str | None = None) -> DataFrame:
        payload = self._request(
            "POST", endpoint, json={"query": query, "variables": variables or {}},
            headers=self._headers(),
        )
        records = extract_data_path(payload, data_path or "data")
        if not records:
            return self.spark.createDataFrame([], schema="dummy string").limit(0)
        return self.spark.createDataFrame(records)
