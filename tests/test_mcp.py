"""MCP server tests: tool registration, JSON-RPC dispatch, and a real
preprocess + train drive through ``_run_stamp`` (coverage the reference
gets implicitly by running under FastMCP, reference mcp/server.py:64-115).

Runs on the in-repo minimal MCP runtime when ``fastmcp`` is absent — the
point is that the *same server module* serves its tools either way.
"""

import asyncio
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from random_data import create_random_dataset

EXPECTED_TOOLS = {
    "preprocess_stamp",
    "train_stamp",
    "crossval_stamp",
    "deploy_stamp",
    "statistics_stamp",
    "heatmaps_stamp",
    "encode_slides_stamp",
    "encode_patients_stamp",
    "read_file",
    "list_files",
    "analyze_csv",
    "list_column_values",
    "check_available_devices",
}


@pytest.fixture(scope="module")
def server():
    from stamp_tpu.mcp import server

    return server


def test_all_tools_registered(server):
    assert set(server.mcp.tools) == EXPECTED_TOOLS


def test_tool_schemas_hide_context(server):
    for tool in server.mcp.tools.values():
        assert "ctx" not in tool.input_schema["properties"]
        assert tool.description  # every tool documents itself


def test_tool_schemas_type_optional_params(server):
    """PEP 604 unions (e.g. ``cache_dir: str | None``) must surface as the
    typed non-None schema, not an empty one."""
    schema = server.mcp.tools["preprocess_stamp"].input_schema["properties"]
    assert schema["cache_dir"] == {"type": "string"}
    assert schema["brightness_cutoff"] == {"type": "integer"}
    assert schema["default_slide_mpp"] == {"type": "number"}


def test_jsonrpc_initialize_and_list(server):
    sent: list[dict] = []
    response = server.mcp.handle_request(
        {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
        sent.append,
    )
    assert response["result"]["serverInfo"]["name"] == "stamp-tpu"

    response = server.mcp.handle_request(
        {"jsonrpc": "2.0", "id": 2, "method": "tools/list"}, sent.append
    )
    listed = {t["name"] for t in response["result"]["tools"]}
    assert listed == EXPECTED_TOOLS


def test_jsonrpc_tool_call_roundtrip(server, tmp_path, monkeypatch):
    monkeypatch.setenv("STAMP_MCP_ROOT", str(tmp_path))
    monkeypatch.setattr(server, "STAMP_ROOT", tmp_path)
    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,x\n2,y\n")

    sent: list[dict] = []
    response = server.mcp.handle_request(
        {
            "jsonrpc": "2.0",
            "id": 3,
            "method": "tools/call",
            "params": {"name": "analyze_csv", "arguments": {"path": "t.csv"}},
        },
        sent.append,
    )
    text = response["result"]["content"][0]["text"]
    assert "a" in text and "b" in text
    assert not response["result"]["isError"]


def test_jsonrpc_unknown_tool_is_an_error(server):
    response = server.mcp.handle_request(
        {
            "jsonrpc": "2.0",
            "id": 4,
            "method": "tools/call",
            "params": {"name": "nope", "arguments": {}},
        },
        lambda _m: None,
    )
    assert "error" in response


@pytest.mark.slow
def test_preprocess_and_train_through_run_stamp(server, tmp_path, monkeypatch):
    """Two tools round-trip end to end: preprocess a synthetic WSI, then
    train on a synthetic planted-signal cohort — both through the temp-YAML
    → ``_run_cli`` path the reference uses."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    # --- preprocess a tiny synthetic slide with the `empty` extractor ----
    wsi_dir = tmp_path / "wsi"
    wsi_dir.mkdir()
    rng = np.random.default_rng(0)
    img = np.full((896, 896, 3), 255, np.uint8)
    img[224:672, 224:672] = rng.integers(50, 200, (448, 448, 3), np.uint8)
    Image.fromarray(img).save(
        wsi_dir / "s1.tiff", compression="tiff_lzw",
        resolution=10000.0, resolution_unit=3,
    )

    result = asyncio.run(
        server.mcp.call_tool(
            "preprocess_stamp",
            {
                "output_dir": str(tmp_path / "pp"),
                "wsi_dir": str(wsi_dir),
                "extractor": "empty",
                "device": "cpu",
                "max_workers": 2,
            },
        )
    )
    assert "completed successfully" in result, result
    assert list((tmp_path / "pp").rglob("*.h5"))

    # --- train on a synthetic feature cohort -----------------------------
    cohort_dir = tmp_path / "cohort"
    cohort_dir.mkdir()
    clini, slide, feats, categories = create_random_dataset(
        dir=cohort_dir,
        n_patients=8,
        max_slides_per_patient=1,
        min_tiles_per_slide=8,
        max_tiles_per_slide=16,
        feat_dim=4,
        n_categories=2,
    )
    ctx = server.Context() if hasattr(server.Context, "messages") else None
    result = asyncio.run(
        server.mcp.call_tool(
            "train_stamp",
            {
                "output_dir": str(tmp_path / "train"),
                "clini_table": str(clini),
                "slide_table": str(slide),
                "feature_dir": str(feats),
                "ground_truth_label": "ground-truth",
                "patient_label": "patient",
                "filename_label": "slide_path",
                "categories": list(categories),
            },
        )
    )
    assert "completed successfully" in result, result
    assert (tmp_path / "train" / "model.ckpt").exists()


def test_stdio_protocol_line_format(server):
    """A serialized request through the dispatcher produces valid JSON-RPC."""
    sent: list[dict] = []
    request = json.loads(
        '{"jsonrpc": "2.0", "id": 9, "method": "tools/list"}'
    )
    response = server.mcp.handle_request(request, sent.append)
    serialized = json.dumps(response)
    assert json.loads(serialized)["id"] == 9
