"""Custom operators: capabilities the reference has but Spark lacks a
builtin for, implemented as compositions of DataFrame ops (preferred) or
Arrow-batched pandas UDFs (only where composition can't express the
semantics). Everything here is shuffle-conscious: each docstring states the
partitioning the operator induces and why it holds at 100 TB.
"""
