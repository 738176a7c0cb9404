import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture()
def fixture_schema_json():
    """The reference's 3-field fixture schema
    (/root/reference/test/lib/fixtures.js:15-48)."""
    return [
        {"name": "title", "type": "text",
         "options": {"indexing": {"record": "position", "tokenizer": "en_stem"}, "stored": True}},
        {"name": "body", "type": "text",
         "options": {"indexing": {"record": "position", "tokenizer": "en_stem"}, "stored": True}},
        {"name": "id", "type": "text", "options": {"indexing": None, "stored": True}},
    ]


@pytest.fixture()
def fixture_docs():
    return (
        [{"id": "first1", "title": "Hello world!", "body": "hi first tell me more"},
         {"id": "first2", "title": "Ola mundo!", "body": "hi first que pasa pues"}],
        [{"id": "second1", "title": "Bonjour monde!", "body": "hi second tres bien"},
         {"id": "second2", "title": "Ciao mondo!", "body": "hi second buon giorno"}],
    )
