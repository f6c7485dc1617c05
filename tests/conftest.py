import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    from analiticcl_ray.sources.corpus import generate_corpus

    return generate_corpus(400, 42)


@pytest.fixture(scope="session")
def small_truth(small_corpus):
    from analiticcl_ray.pipelines.oracle import oracle_pairs

    return oracle_pairs(small_corpus)
