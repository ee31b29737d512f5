"""Host I/O boundary: TRX backends and UDP PDU ingress."""
