"""QA CLI surfaces: eval_qa + qa_analysis end to end with keyless backends."""

import json
import os


def _write_qa(tmp_path, n=6):
    items = [{
        "id": i,
        "question": {"text": f"Which shape is object {i}?", "image_refs": {}},
        "options": [{"id": "a", "text": "cube"}, {"id": "b", "text": "cone"}],
        "answer": "a",
        "template": "shape",
    } for i in range(n)]
    path = tmp_path / "qa.json"
    path.write_text(json.dumps(items))
    return str(path)


def test_eval_qa_cli_mock_and_range(tmp_path, capsys):
    qa_path = _write_qa(tmp_path)
    out_dir = str(tmp_path / "results")
    from videocad_tpu.cli.eval_qa import main
    main(["--qa_dataset_path", qa_path, "--output_dir", out_dir,
          "--model_name", "random", "--question_range", "1-4", "--seed", "3"])
    results_dir = os.path.join(out_dir, "random")
    files = os.listdir(results_dir)
    assert any(f.startswith("model_results_1-4") for f in files)
    assert any(f.startswith("model_answers_1-4") for f in files)
    with open(os.path.join(results_dir, "model_answers_1-4.json")) as f:
        metrics = json.load(f)
    assert metrics["num_questions"] == 4


def test_qa_analysis_cli(tmp_path):
    qa_path = _write_qa(tmp_path)
    out_dir = str(tmp_path / "results")
    from videocad_tpu.cli.eval_qa import main as eval_main
    eval_main(["--qa_dataset_path", qa_path, "--output_dir", out_dir,
               "--model_name", "random", "--seed", "5"])
    # triplicate the run so voting groups are valid
    model_dir = os.path.join(out_dir, "random")
    base = [f for f in os.listdir(model_dir) if "results" in f][0]
    data = open(os.path.join(model_dir, base)).read()
    for i in (2, 3):
        with open(os.path.join(model_dir, f"model_results_r{i}.json"), "w") as f:
            f.write(data)
    res_path = str(tmp_path / "res_final.json")
    from videocad_tpu.cli.qa_analysis import main as analysis_main
    analysis_main(["--qa_dataset_path", qa_path, "--model_dirs", model_dir,
                   "--results_path", res_path])
    saved = json.loads(open(res_path).read())
    assert saved[-1]["model"] == "random"
    assert saved[-1]["num_questions"] == 6
