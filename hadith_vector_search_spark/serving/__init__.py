"""Serving surfaces over the engine API (SURVEY §4 — the reference's
transports): an MCP-shaped stdio JSON-RPC loop (`serving.stdio`) mirroring
/root/reference/mcp_server/mcp_stdio.py. The engine itself stays a library
(`api.HybridEngine`); serving is a thin dispatch layer."""

from .stdio import StdioServer, TOOL_DEFINITIONS  # noqa: F401
