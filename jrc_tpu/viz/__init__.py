"""Offline rendering equivalents of the reference's Qt/QWT GUI sinks."""
