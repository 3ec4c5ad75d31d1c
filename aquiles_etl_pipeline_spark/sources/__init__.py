from .extractor import DeterministicMockExtractor, InvoiceExtractor, OpenAIVisionExtractor
from .orchestrator import (
    ProcessingResult,
    process_csv_file,
    process_csv_text,
    process_invoice_image,
)

__all__ = [
    "DeterministicMockExtractor",
    "InvoiceExtractor",
    "OpenAIVisionExtractor",
    "ProcessingResult",
    "process_csv_file",
    "process_csv_text",
    "process_invoice_image",
]
