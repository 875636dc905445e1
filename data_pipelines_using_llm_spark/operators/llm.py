"""LLM-transform operator: batched model calls over document partitions —
the north-star capability of an "LLM data pipeline" engine (the reference
repo *is* a corpus of LLM-generated pipelines; BASELINE.json:
"UDF-based LLM calls" as the transform layer).

Architecture (the part under test, independent of any actual model):

- ``mapInPandas`` streams Arrow batches per partition; prompts are
  re-chunked into ``batch_size`` micro-batches — the unit a real API call
  sends.  No collect, no driver round-trips: at 100 TB each executor
  drives its own request stream.
- A token-bucket **rate limiter** (injectable clock) and bounded
  **retry-with-backoff** wrap every backend call — per-partition state,
  the same discipline a production pipeline needs against 429s.
- The **backend** is pluggable.  A real HTTP backend belongs behind
  ``require_llm_backend`` (raises: no credentials/network here — a
  production build drops in its client).  ``StubBackend`` is the default:
  a deterministic extractive "summarizer" whose output is a pure function
  of the prompt, which keeps the whole operator inside the DuckDB oracle
  gate (plans/llm_queries.py mirrors it in SQL).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (re-exported for callers)

SUMMARY_TOKENS = 12

def llm_result_schema(id_type: str = "long") -> str:
    return (
        f"doc_id {id_type}, response string, n_prompt_tokens int, "
        "n_response_tokens int, n_api_calls int"
    )


LLM_RESULT_SCHEMA = llm_result_schema()


def require_llm_backend() -> None:
    """Gate for a real model backend.  Always raises in this environment —
    there is no API endpoint or credential; plug a production client in
    here (the operator machinery above it is backend-agnostic)."""
    raise NotImplementedError(
        "no LLM API credentials/network in this environment; "
        "use StubBackend (deterministic) or inject a client"
    )


class StubBackend:
    """Deterministic extractive 'summary': the first SUMMARY_TOKENS
    whitespace tokens of the prompt.  A pure function of the input, so
    results are reproducible and DuckDB-checkable."""

    def complete(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            toks = p.split()
            out.append(" ".join(toks[:SUMMARY_TOKENS]))
        return out


class FlakyBackend:
    """Test double: fails the first ``fail_times`` calls with a retryable
    error, then delegates to StubBackend — exercises the retry loop."""

    def __init__(self, fail_times: int = 2):
        self.fail_times = fail_times
        self.calls = 0
        self._inner = StubBackend()

    def complete(self, prompts: list[str]) -> list[str]:
        self.calls += 1
        if self.calls <= self.fail_times:
            raise TimeoutError("simulated 429/timeout")
        return self._inner.complete(prompts)


class NonceBackend:
    """Test double: StubBackend whose response embeds a unique per-call
    nonce, so rows sharing a response string provably shared ONE api call
    (the property :func:`llm_transform_cached` exists to provide)."""

    def __init__(self):
        import os

        self._pid = os.getpid()
        self.n = 0
        self._inner = StubBackend()

    def complete(self, prompts: list[str]) -> list[str]:
        self.n += 1
        nonce = f"{self._pid}:{id(self)}:{self.n}"
        return [f"{nonce}|{r}" for r in self._inner.complete(prompts)]


@dataclass
class RateLimiter:
    """Token bucket: at most ``rate`` calls per second, injectable clock so
    tests (and the stub path) never actually sleep."""

    rate: float = float("inf")
    clock: Callable[[], float] = time.monotonic
    sleep: Callable[[float], None] = time.sleep
    _next_free: float = field(default=0.0, init=False)

    def acquire(self) -> None:
        if self.rate == float("inf"):
            return
        now = self.clock()
        if now < self._next_free:
            self.sleep(self._next_free - now)
            now = self._next_free
        self._next_free = now + 1.0 / self.rate


def call_with_retry(
    backend,
    prompts: list[str],
    max_retries: int = 3,
    backoff_s: float = 0.05,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[list[str], int]:
    """Bounded exponential backoff around one micro-batch call; returns
    (responses, attempts)."""
    attempt = 0
    while True:
        attempt += 1
        try:
            return backend.complete(prompts), attempt
        except (TimeoutError, ConnectionError, OSError):
            if attempt > max_retries:
                raise
            sleep(backoff_s * 2 ** (attempt - 1))


def llm_transform(
    df: DataFrame,
    id_col: str,
    prompt_col: str,
    backend_factory: Callable[[], object] = StubBackend,
    batch_size: int = 32,
    rate_per_sec: float = float("inf"),
    max_retries: int = 3,
    id_type: str = "long",
) -> DataFrame:
    """Run an LLM completion over every row, batched per partition.

    ``backend_factory`` is called once per partition (clients are not
    picklable and must not be shared across processes).  Emits the
    response plus prompt/response token counts and how many API calls the
    row's micro-batch needed (1 without retries).  ``id_type`` lets a
    caller key rows by something other than a long id (the cached variant
    passes the prompt digest through as a string key).
    """
    to_id = int if id_type == "long" else str

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()
        limiter = RateLimiter(rate=rate_per_sec)
        pending_ids: list = []
        pending_prompts: list[str] = []

        def flush() -> pd.DataFrame:
            limiter.acquire()
            responses, attempts = call_with_retry(
                backend, pending_prompts, max_retries=max_retries
            )
            out = pd.DataFrame(
                {
                    "doc_id": pending_ids,
                    "response": responses,
                    "n_prompt_tokens": [len(p.split()) for p in pending_prompts],
                    "n_response_tokens": [len(r.split()) for r in responses],
                    "n_api_calls": [attempts] * len(responses),
                }
            )
            pending_ids.clear()
            pending_prompts.clear()
            return out

        for pdf in batches:
            for doc_id, prompt in zip(pdf[id_col], pdf[prompt_col]):
                pending_ids.append(to_id(doc_id))
                pending_prompts.append(str(prompt))
                if len(pending_ids) >= batch_size:
                    yield flush()
        if pending_ids:
            yield flush()

    return df.select(id_col, prompt_col).mapInPandas(fn, llm_result_schema(id_type))


def llm_transform_cached(
    df: DataFrame,
    id_col: str,
    prompt_col: str,
    backend_factory: Callable[[], object] = StubBackend,
    batch_size: int = 32,
    rate_per_sec: float = float("inf"),
    max_retries: int = 3,
) -> DataFrame:
    """:func:`llm_transform` with prompt-level request deduplication — the
    single biggest cost lever in a corpus pipeline: web-scale corpora are
    full of repeated boilerplate, and an identical prompt must never be
    paid for twice.

    One representative row per distinct prompt goes through the model
    call; responses join back to every original row ON THE PROMPT DIGEST
    itself (``sha2(prompt)`` travels through the model stage as the row
    key), so the mapping is exact even when ``id_col`` has duplicate
    values — no representative-id indirection to mis-join.  The dedup and
    the join shuffle a 64-char digest, not arbitrary document text; at
    256 bits collision risk is nil.

    Duplicate rows therefore share the response of ONE api call — the
    caching test asserts this by marking responses with a per-call nonce.
    """
    keyed = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(prompt_col).alias("_prompt"),
        F.sha2(F.col(prompt_col).cast("string"), 256).alias("_pkey"),
    )
    reps = keyed.groupBy("_pkey").agg(F.min("_prompt").alias("_prompt"))
    rep_out = llm_transform(
        reps,
        "_pkey",
        "_prompt",
        backend_factory=backend_factory,
        batch_size=batch_size,
        rate_per_sec=rate_per_sec,
        max_retries=max_retries,
        id_type="string",
    )
    responses = rep_out.withColumnRenamed("doc_id", "_pkey")
    return keyed.join(responses, "_pkey").select(
        "doc_id",
        "response",
        "n_prompt_tokens",
        "n_response_tokens",
        "n_api_calls",
    )
