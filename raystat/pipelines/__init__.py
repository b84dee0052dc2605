"""High-level pipelines: the driver-contract query catalog
(:mod:`raystat.pipelines.queries`) and the documents→token-stream
derivation (:mod:`raystat.pipelines.tokens`)."""
