"""Realtime serving surface: embedded API, TCP server, C-ABI backend."""
