"""Tier-1/Tier-2 KDC log queries (SURVEY.md §2.1, §2.2). Filled in Phase 2."""

from __future__ import annotations
