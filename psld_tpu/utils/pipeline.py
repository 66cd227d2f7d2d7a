"""Host-side pipelining helpers."""

from __future__ import annotations

from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")


def lagged(items: Iterable[T]) -> Iterator[T]:
    """Yield each item one production late: the producer runs one element
    ahead of the consumer.

    With an async-dispatch producer (each item holds in-flight device
    results) and a blocking consumer (fetch + encode/write), this overlaps
    host work on item k with device compute of item k+1 — the double-buffer
    used by ``eval/generate.py`` and ``serve/server.py``.
    """
    it = iter(items)
    try:
        prev = next(it)
    except StopIteration:
        return
    for item in it:
        yield prev
        prev = item
    yield prev
