"""Pluggable invoice-image extractor seam (S13).

The reference calls Azure OpenAI vision per image and parses the
returned CSV text (/root/reference/core/etl_orchestrator.py:192-277).
Here that's an interface: production would wire an LLM client; tests
and this container use the deterministic mock (the vision API and its
SDK are external services, deliberately not imported).

The Spark-side plumbing — binary image column in, CSV text out,
markdown-fence stripping, convergence into the CSV pipeline — is real
and tested; only the remote model call is behind the seam.
"""

from __future__ import annotations

from typing import Protocol


class InvoiceExtractor(Protocol):
    def extract(self, image_bytes: bytes, image_name: str) -> str:
        """Return CSV text (may be markdown-fenced) for one invoice image."""
        ...


class DeterministicMockExtractor:
    """Mirrors the reference's mocked OpenAI responses
    (tests/test_invoice_processing.py:35,68): bare or fenced CSV with
    the canonical Spanish headers."""

    def __init__(self, fenced: bool = False, rows: list[tuple[str, str, str, str]] | None = None):
        self.fenced = fenced
        self.rows = rows or [("Test Product", "Test Provider", "100.00", "19")]

    def extract(self, image_bytes: bytes, image_name: str) -> str:
        body = "Producto,Provedor,Precio,Porcentaje de IVA\n" + "\n".join(
            ",".join(r) for r in self.rows
        )
        if self.fenced:
            return f"```csv\n{body}\n```"
        return body


class OpenAIVisionExtractor:
    """Production seam for the reference's Azure OpenAI vision call
    (etl:192-277: base64 image part + prompt, max_tokens 800,
    temperature 0.1).  Not runnable in this container — no network and
    no SDK — so it raises until wired to a real client."""

    def __init__(self, endpoint: str, api_key: str, model: str = "gpt-4-vision-preview"):
        self.endpoint, self.api_key, self.model = endpoint, api_key, model

    def extract(self, image_bytes: bytes, image_name: str) -> str:
        raise NotImplementedError(
            "LLM vision extraction requires an external API client; "
            "inject any InvoiceExtractor implementation instead"
        )
