import os

import pytest

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_transcripts():
    """sf-tiny deterministic transcripts (~50 convs) as a Ray Dataset."""
    import ray.data

    from asterixdb_analytics_ray.sources.transcripts import (
        TranscriptSpec,
        transcripts_chunk,
    )

    spec = TranscriptSpec(n_convs=50, seed=42)
    return ray.data.from_arrow(
        transcripts_chunk(spec.seed, 0, spec.n_convs, spec.n_tools)
    )


@pytest.fixture(scope="session")
def tiny_graph(tiny_transcripts):
    from asterixdb_analytics_ray.graph import build_link_graph

    return build_link_graph(tiny_transcripts)
