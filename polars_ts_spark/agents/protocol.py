"""LLM backend protocol + shared context (ref agents/_protocol.py:1-38
defines the same two surfaces; the shapes here are our own).

A backend is anything with ``complete(prompt) -> str``; the default
rule-based backend returns the empty string, which every agent treats
as "use my built-in deterministic heuristics" — no LLM ever sits in
the engine path. Context state is driver-small: the data rides as a
lazy Spark DataFrame reference that the agents never materialize."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Protocol, runtime_checkable

from pyspark.sql import DataFrame


@runtime_checkable
class LLMBackend(Protocol):
    def complete(self, prompt: str) -> str: ...


class RuleBasedBackend:
    """Deterministic default. ``complete`` yields "" so callers fall
    through to their heuristic branch; ``is_rule_based`` marks it so
    agents can skip building prompts entirely."""

    is_rule_based = True

    def complete(self, prompt: str) -> str:  # noqa: ARG002
        return ""


def _wants_llm(backend) -> bool:
    """True when the backend should be consulted for narrative text."""
    return not getattr(backend, "is_rule_based", False)


@dataclass
class AgentContext:
    """Driver-small shared state threaded through a pipeline run: the
    lazy data frame, free-form metadata, an append-only log of agent
    messages, and caller-supplied event annotations."""

    data: DataFrame
    metadata: dict[str, Any] = field(default_factory=dict)
    history: list[dict[str, Any]] = field(default_factory=list)
    events: list[dict[str, Any]] = field(default_factory=list)

    def log(self, agent: str, message: str) -> None:
        self.history.append({"agent": agent, "message": message})

    def messages_from(self, agent: str) -> list[str]:
        return [h["message"] for h in self.history if h["agent"] == agent]
