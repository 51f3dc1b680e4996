"""Sources: synthetic span-corpus generation and adapters for external tables."""
