"""Tier-3 LLM-data-pipeline operators (SURVEY.md §2.3). Filled in Phase 5."""

from __future__ import annotations
