"""Memory orchestrator: the primary public API (reference:
Sources/Wax/Orchestrator/MemoryOrchestrator.swift:6)."""
from wax_tpu.orchestrator.config import OrchestratorConfig, RewriteSchedule
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator, RememberResult

__all__ = ["MemoryOrchestrator", "OrchestratorConfig", "RememberResult", "RewriteSchedule"]
