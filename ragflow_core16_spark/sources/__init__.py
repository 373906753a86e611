"""Source connectors: external container formats → the ``pages`` table."""
