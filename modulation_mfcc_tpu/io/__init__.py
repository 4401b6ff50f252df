"""Host-side I/O: WAV, AG50x EMA, TextGrid, CSV export, corpus manifests."""
