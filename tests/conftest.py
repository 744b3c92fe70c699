import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from ck_ray.corpus import generate_corpus

    return generate_corpus(n_files=200, seed=42)


@pytest.fixture(scope="session")
def tiny_index(ray_session, tiny_corpus, tmp_path_factory):
    """Index built once from the tiny corpus; shared by query tests."""
    import ray.data

    from ck_ray.build import IndexConfig, build_index

    d = str(tmp_path_factory.mktemp("idx"))
    build_index(
        ray.data.from_arrow(tiny_corpus),
        d,
        IndexConfig(num_parts=4, batch_size=64),
    )
    return d
