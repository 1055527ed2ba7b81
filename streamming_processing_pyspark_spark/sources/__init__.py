"""Sources: ragged taxi CSV (batch + stream), file streams, socket streams."""
