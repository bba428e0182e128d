"""QA harness: pipeline with keyless backends, resume, majority vote."""

import json
import os

import pytest

from videocad_tpu.qa import (
    EvaluationPipeline,
    MockClient,
    QADataset,
    RandomClient,
    create_client,
    eval_model_dir,
    group_outputs,
    majority_vote_accuracy,
    recover_answer_id,
)


@pytest.fixture()
def qa_file(tmp_path):
    items = []
    for i in range(10):
        items.append({
            "id": i,
            "question": {"text": f"What is shape <img_0> number {i}?",
                         "image_refs": {}},
            "options": [{"id": "a", "text": "cube"},
                        {"id": "b", "text": "sphere"},
                        {"id": "c", "text": "cone"}],
            "answer": "a",
            "template": "shape" if i % 2 == 0 else "count",
        })
    path = tmp_path / "qa.json"
    path.write_text(json.dumps(items))
    return str(path)


def test_dataset_loading_and_range(qa_file):
    ds = QADataset(qa_file)
    assert len(ds) == 10
    assert ds.get(3).template == "count"
    ranged = QADataset(qa_file, question_range=(2, 5))
    assert len(ranged) == 3


def test_recover_answer_id():
    import random
    rng = random.Random(0)
    assert recover_answer_id("a", ["a", "b"], rng) == "a"
    assert recover_answer_id(" B ", ["a", "b"], rng) == "b"
    # substring scan in option order (reference eval_qa.py:296): 'a' hits
    # first inside "answer"
    assert recover_answer_id("the answer is b.", ["a", "b"], rng) == "a"
    assert recover_answer_id("option: b", ["a", "b"], rng) == "b"
    assert recover_answer_id("xyz", ["a", "b"], rng) in ("a", "b")


def test_mock_pipeline_scores_100_when_first_option_correct(qa_file, tmp_path):
    ds = QADataset(qa_file)
    pipe = EvaluationPipeline(ds, str(tmp_path / "out"), MockClient())
    metrics = pipe.run()
    assert metrics["overall_accuracy"] == 100.0  # answer is always 'a'
    assert metrics["shape"] == 100.0
    assert metrics["num_questions"] == 10
    assert os.path.exists(pipe.results_path)
    assert os.path.exists(pipe.answers_path)


def test_pipeline_resumes_from_existing_results(qa_file, tmp_path):
    ds = QADataset(qa_file)
    out = str(tmp_path / "out")
    pipe = EvaluationPipeline(ds, out, MockClient())
    pipe.run()

    class Exploder(MockClient):
        def complete(self, item):
            raise AssertionError("should not be called on resume")

    resumed = EvaluationPipeline(ds, out, Exploder())
    assert len(resumed.outputs) == 10
    metrics = resumed.run()  # all questions already processed
    assert metrics["num_questions"] == 10


def test_random_client_and_provider_routing(qa_file, tmp_path):
    ds = QADataset(qa_file)
    client = create_client("random", seed=1)
    assert isinstance(client, RandomClient)
    pipe = EvaluationPipeline(ds, str(tmp_path / "out"), client, seed=1)
    metrics = pipe.run()
    assert 0 <= metrics["overall_accuracy"] <= 100
    with pytest.raises(ValueError):
        create_client("gpt-4.1")  # no key in env
    with pytest.raises(ValueError):
        create_client("unknown-model-zzz")


def test_majority_vote_and_even_group_shedding(qa_file):
    ds = QADataset(qa_file)
    # 4 votes -> drop one least-common, strict mode wins
    outputs = [
        {"question_id": 0, "answer": "a", "correct": 1},
        {"question_id": 0, "answer": "a", "correct": 1},
        {"question_id": 0, "answer": "b", "correct": 0},
        {"question_id": 0, "answer": "b", "correct": 0},
        # only 2 votes -> dropped entirely
        {"question_id": 1, "answer": "a", "correct": 1},
        {"question_id": 1, "answer": "a", "correct": 1},
        # 3 votes, mode 'c' (wrong)
        {"question_id": 2, "answer": "c", "correct": 0},
        {"question_id": 2, "answer": "c", "correct": 0},
        {"question_id": 2, "answer": "a", "correct": 1},
    ]
    groups = group_outputs(outputs, 0, 10)
    assert set(groups) == {0, 2}
    assert len(groups[0]) == 3
    results = majority_vote_accuracy(ds, outputs)
    assert results["num_questions"] == 2
    # question 2 votes 'c' (wrong); question 0's shed vote decides its mode
    assert results["num_correct"] in (0, 1)


def test_eval_model_dir_appends_res_final(qa_file, tmp_path, monkeypatch):
    ds = QADataset(qa_file)
    out = tmp_path / "out"
    pipe = EvaluationPipeline(ds, str(out), MockClient())
    pipe.run()
    # triplicate the run so every question has 3 votes
    base = json.loads(pipe.results_path.read_text())
    for i in (2, 3):
        (out / "mock" / f"model_results_r{i}.json").write_text(json.dumps(base))
    monkeypatch.chdir(tmp_path)
    results = eval_model_dir(str(out / "mock"), ds)
    assert results["overall_accuracy"] == 100.0
    saved = json.loads((tmp_path / "res_final.json").read_text())
    assert saved[-1]["model"] == "mock"
