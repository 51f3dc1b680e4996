"""LLM-shaped async extraction client + actor-pool stage.

The reference's production extraction path is an LLM client built once and
shared by every agent (ST1: src/utils/llm.py:15-51 — provider routed by
model-name pattern, one blocking HTTP call per document). This module gives
the flagship the same swap-in surface, Ray-native:

- :class:`RateLimitedLLMClient` — the async client shape a production model
  endpoint needs: provider routing by model name, bounded in-flight
  concurrency (semaphore), a sliding-window requests-per-minute throttle,
  exponential-backoff retries on transient errors, and a pluggable
  ``transport`` coroutine. The sandbox/test transport is deterministic
  (:class:`DeterministicTransport` — the reference's DEBUG-fixture precedent,
  src/agents/entity_extraction_agent.py:44-48); production injects an HTTP
  transport with the identical signature.
- :class:`LLMTripleExtractor` — the actor-pool stage: the client is built
  ONCE per actor in ``__init__``; ``__call__`` fans a batch's documents
  through the client concurrently and applies the reference's
  degrade-don't-die semantics per document (src/main.py:132-134): a doc
  whose call still fails after retries becomes ONE quarantine record
  (``pred='EXTRACTION_FAILED'``, the error in the description field) that
  flows through validation as queryable provenance — the batch, the actor,
  and the pipeline all survive.

The request/response boundary is honest LLM-shaped data: prompt in (JSON
string carrying doc_id + text), completion out (JSON string of records), so
swapping the deterministic transport for a real endpoint changes no stage
code.
"""

from __future__ import annotations

import asyncio
import json
import re
import time
from collections import deque

import pyarrow as pa


class TransientLLMError(RuntimeError):
    """Retryable failure (rate-limit / 5xx / timeout shape)."""


class DeterministicTransport:
    """Test/sandbox transport: the rule-based extractor behind the async
    LLM-call signature. Patterns compile lazily once per process."""

    def __init__(self, vocab: dict | None = None):
        self.vocab = vocab
        self._patterns = None

    async def __call__(self, model: str, prompt: str) -> str:
        from .extract import compile_patterns, extract_doc_records

        if self._patterns is None:
            self._patterns = compile_patterns(self.vocab)
        req = json.loads(prompt)
        recs = extract_doc_records(req["doc_id"], req["text"], *self._patterns)
        return json.dumps([list(r) for r in recs])


class FaultInjectionTransport:
    """Deterministic chaos transport for fault-injection tests: hard-fails on
    a poisoned doc-id set (→ quarantine path) and raises ONE transient error
    per doc-id in ``flaky`` (→ retry path), otherwise delegates to
    :class:`DeterministicTransport`. Lives in the library (not the tests) so
    Ray actor workers can import it by reference."""

    def __init__(self, poison=(), flaky=(), vocab: dict | None = None):
        self.poison = set(poison)
        self.flaky = set(flaky)
        self._flaked: set = set()
        self._inner = DeterministicTransport(vocab)

    async def __call__(self, model: str, prompt: str) -> str:
        doc_id = json.loads(prompt)["doc_id"]
        if doc_id in self.poison:
            raise ValueError(f"malformed document payload: {doc_id}")
        if doc_id in self.flaky and doc_id not in self._flaked:
            self._flaked.add(doc_id)
            raise TransientLLMError("rate limited")  # retried, then succeeds
        return await self._inner(model, prompt)


class RateLimitedLLMClient:
    """Async completion client with the production guardrails.

    - provider routing by model-name pattern (``gpt-*``/``o1-*`` → "openai",
      else "together") — reference src/utils/llm.py:33-51;
    - at most ``max_concurrency`` calls in flight per client (→ per actor);
    - optional ``requests_per_minute`` sliding-window throttle;
    - ``max_retries`` exponential-backoff retries, but ONLY on
      :class:`TransientLLMError` — a deterministic failure (parse error,
      poisoned input) surfaces immediately for quarantine instead of
      burning the retry budget.
    """

    def __init__(self, model: str = "det-extractor-v1", transport=None,
                 max_concurrency: int = 8, requests_per_minute: int = 0,
                 max_retries: int = 2, backoff_base: float = 0.02):
        self.model = model
        self.provider = ("openai" if re.match(r"(gpt-|o1-)", model)
                         else "together")
        self.transport = transport or DeterministicTransport()
        self.max_concurrency = max_concurrency
        self.rpm = requests_per_minute
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self._sem: asyncio.Semaphore | None = None
        self._stamps: deque = deque()

    async def _throttle(self) -> None:
        if not self.rpm:
            return
        while True:
            now = time.monotonic()
            while self._stamps and now - self._stamps[0] > 60.0:
                self._stamps.popleft()
            if len(self._stamps) < self.rpm:
                self._stamps.append(now)
                return
            await asyncio.sleep(60.0 - (now - self._stamps[0]) + 1e-3)

    async def complete(self, prompt: str) -> str:
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            async with self._sem:
                await self._throttle()
                try:
                    return await self.transport(self.model, prompt)
                except TransientLLMError as exc:
                    last = exc
            await asyncio.sleep(self.backoff_base * (2 ** attempt))
        raise last  # retries exhausted → caller quarantines

    def complete_many(self, prompts: list[str]) -> list:
        """Run a batch of prompts concurrently; per-prompt failures come back
        as Exception objects (never raised), so one poisoned document cannot
        take down its batch."""

        async def run():
            self._sem = asyncio.Semaphore(self.max_concurrency)
            return await asyncio.gather(
                *[self.complete(p) for p in prompts], return_exceptions=True)

        return asyncio.run(run())


class LLMTripleExtractor:
    """Actor-pool extraction stage over the LLM-shaped client.

    Use as ``docs.map_batches(LLMTripleExtractor, fn_constructor_kwargs=...,
    batch_format="pyarrow", concurrency=N)``. Emits RECORDS_SCHEMA batches —
    the same contract as the rule-based :class:`~.extract.TripleExtractor` —
    with per-document quarantine on transport failure.
    """

    def __init__(self, vocab: dict | None = None, with_meta: bool = False,
                 model: str = "det-extractor-v1", transport=None,
                 max_concurrency: int = 8, requests_per_minute: int = 0,
                 max_retries: int = 2):
        self.client = RateLimitedLLMClient(
            model=model,
            transport=transport or DeterministicTransport(vocab),
            max_concurrency=max_concurrency,
            requests_per_minute=requests_per_minute,
            max_retries=max_retries,
        )
        self.with_meta = with_meta

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .extract import (_doc_spans_from_batch, meta_record,
                              records_to_table)

        doc_ids, kinds, texts, refs, offsets = _doc_spans_from_batch(batch)
        prompts = []
        for i, doc_id in enumerate(doc_ids):
            lo, hi = offsets[i], offsets[i + 1]
            prompts.append(json.dumps(
                {"doc_id": doc_id, "text": "\n".join(texts[lo:hi])}))
        results = self.client.complete_many(prompts)

        records: list[tuple] = []
        for i, (doc_id, res) in enumerate(zip(doc_ids, results)):
            if isinstance(res, Exception):
                # quarantine row: the run degrades, never dies
                records.append(
                    (doc_id, "paper", doc_id, "EXTRACTION_FAILED", "status",
                     type(res).__name__, 0.0, "llm-transport-error",
                     str(res)[:200], "{}"))
            else:
                records.extend(tuple(r) for r in json.loads(res))
            if self.with_meta:
                lo, hi = offsets[i], offsets[i + 1]
                records.append(meta_record(doc_id, kinds[lo:hi],
                                           texts[lo:hi], refs[lo:hi]))
        return records_to_table(records)
