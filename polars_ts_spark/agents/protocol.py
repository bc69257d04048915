"""LLM backend protocol + shared context (ref agents/_protocol.py:1-38).

The backend is a one-method protocol so any provider plugs in; the
default is deterministic rule-based heuristics (no LLM anywhere in the
engine path). Context state is driver-small: the data rides as a Spark
DataFrame reference, never materialized by the agents."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Protocol, runtime_checkable

from pyspark.sql import DataFrame


@runtime_checkable
class LLMBackend(Protocol):
    """Anything with ``complete(prompt) -> str``."""

    def complete(self, prompt: str) -> str: ...


class RuleBasedBackend:
    """Deterministic default: agents use their built-in heuristics."""

    def complete(self, prompt: str) -> str:  # noqa: ARG002 - protocol parity
        return ""


@dataclass
class AgentContext:
    """Shared mutable state passed between agents in a pipeline run."""

    data: DataFrame
    metadata: dict[str, Any] = field(default_factory=dict)
    history: list[dict[str, Any]] = field(default_factory=list)
    events: list[dict[str, Any]] = field(default_factory=list)

    def log(self, agent: str, message: str) -> None:
        self.history.append({"agent": agent, "message": message})
