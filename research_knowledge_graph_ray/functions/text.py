"""Text chunking with reference-equivalent semantics.

``chunk_text`` reproduces the reference chunker exactly
(reference: src/agents/paper_ingestion_agent.py:187-221): fixed-size character
chunks with overlap, snapped back to the last sentence boundary ('.' or
newline) when that boundary falls past 70% of the chunk, chunks stripped.
It defines how a flat document becomes the ordered span sequence, so its
byte-level behavior is part of the span-sequence invariant.
"""

from __future__ import annotations


def chunk_text(text: str, chunk_size: int = 2000, overlap: int = 200) -> list[str]:
    """Split ``text`` into overlapping chunks (reference semantics)."""
    if len(text) <= chunk_size:
        return [text]
    chunks: list[str] = []
    start = 0
    while start < len(text):
        end = start + chunk_size
        chunk = text[start:end]
        if end < len(text):
            break_point = max(chunk.rfind("."), chunk.rfind("\n"))
            if break_point > chunk_size * 0.7:
                chunk = chunk[: break_point + 1]
                end = start + break_point + 1
        chunks.append(chunk.strip())
        start = end - overlap
    return chunks


def spans_from_text(doc_id: str, text: str, chunk_size: int = 2000, overlap: int = 200) -> list[dict]:
    """Chunk a flat text into ordered text spans (kind='text', cumulative offsets)."""
    spans = []
    offset = 0
    for chunk in chunk_text(text, chunk_size, overlap):
        spans.append({"kind": "text", "text": chunk, "media_ref": "", "offset": offset})
        offset += max(len(chunk), 1)
    return spans
