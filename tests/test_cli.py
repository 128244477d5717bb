"""CLI tests: flag grammar, dispatch, output formats (reference src/main.rs)."""

import json
import shutil

import pytest

import mp3rgain_tpu as mg
from mp3rgain_tpu import cli
from mp3rgain_tpu.cli import Options, OutputFormat, StoredTagMode, parse_args


def _copy(fixtures_dir, name, tmp_path):
    dst = tmp_path / name
    shutil.copy(fixtures_dir / name, dst)
    return dst


# ---------------------------------------------------------------------------
# Parser (reference src/main.rs:183-434)
# ---------------------------------------------------------------------------


def test_parse_basic_gain():
    o = parse_args(["-g", "2", "a.mp3"])
    assert o.gain_steps == 2
    assert [str(f) for f in o.files] == ["a.mp3"]


def test_parse_attached_values():
    o = parse_args(["-g2", "-d4.5", "-m2", "-i1", "a.mp3"])
    assert o.gain_steps == 2
    assert o.gain_modifier_db == 4.5
    assert o.gain_modifier == 2
    assert o.track_index == 1


def test_parse_negative_gain():
    o = parse_args(["-g", "-3", "a.mp3"])
    assert o.gain_steps == -3


def test_parse_combined_short_flags():
    o = parse_args(["-qp", "-kc", "a.mp3"])
    assert o.quiet and o.preserve_timestamp and o.prevent_clipping and o.ignore_clipping


def test_parse_bare_o_means_tsv():
    o = parse_args(["-o", "a.mp3"])
    assert o.output_format == OutputFormat.TSV
    assert [str(f) for f in o.files] == ["a.mp3"]


def test_parse_o_with_format():
    assert parse_args(["-o", "json", "a.mp3"]).output_format == OutputFormat.JSON
    assert parse_args(["-o", "db", "a.mp3"]).output_format == OutputFormat.TSV
    assert parse_args(["-o", "text", "a.mp3"]).output_format == OutputFormat.TEXT


def test_parse_channel_gain():
    o = parse_args(["-l", "0", "2", "a.mp3"])
    assert o.channel_gain == (mg.Channel.LEFT, 2)
    o = parse_args(["-l", "1", "-2", "a.mp3"])
    assert o.channel_gain == (mg.Channel.RIGHT, -2)


def test_parse_s_modes():
    assert parse_args(["-s", "c", "a.mp3"]).stored_tag_mode == StoredTagMode.CHECK
    assert parse_args(["-s", "d", "a.mp3"]).stored_tag_mode == StoredTagMode.DELETE
    assert parse_args(["-s", "s", "a.mp3"]).stored_tag_mode == StoredTagMode.SKIP
    assert parse_args(["-s", "r", "a.mp3"]).stored_tag_mode == StoredTagMode.RECALC


def test_parse_unknown_flag_warns_not_aborts(capsys):
    o = parse_args(["-z", "a.mp3"])
    assert [str(f) for f in o.files] == ["a.mp3"]
    assert "unknown option" in capsys.readouterr().err


def test_parse_beets_invocation():
    # The beets invocation from docs/compatibility-report.md:238-247.
    o = parse_args(["-o", "-s", "s", "-k", "-d", "0", "file.mp3"])
    assert o.output_format == OutputFormat.TSV
    assert o.stored_tag_mode == StoredTagMode.SKIP
    assert o.prevent_clipping
    assert o.gain_modifier_db == 0.0
    assert [str(f) for f in o.files] == ["file.mp3"]


def test_parse_dry_run_and_flags():
    o = parse_args(["--dry-run", "-w", "-t", "-R", "-e", "-x", "-u", "a.mp3"])
    assert o.dry_run and o.wrap_gain and o.use_temp_file and o.recursive
    assert o.skip_album and o.max_amplitude_only and o.undo


# ---------------------------------------------------------------------------
# Commands against real fixtures
# ---------------------------------------------------------------------------


def test_cmd_info_json(fixtures_dir, tmp_path, capsys):
    path = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    rc = cli.main(["-o", "json", str(path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    rec = out["files"][0]
    assert rec["mpeg_version"] == "MPEG1"
    assert rec["channel_mode"] == "Mono"
    assert rec["headroom_steps"] == 255 - rec["max_gain"]


def test_cmd_apply_and_undo(fixtures_dir, tmp_path, capsys):
    path = _copy(fixtures_dir, "test_joint_stereo.mp3", tmp_path)
    original = path.read_bytes()
    rc = cli.main(["-q", "-g", "2", str(path)])
    assert rc == 0
    assert path.read_bytes() != original
    tag = mg.read_ape_tag_from_file(path)
    assert tag.get_undo_gain() == 2
    rc = cli.main(["-q", "-u", str(path)])
    assert rc == 0
    assert path.read_bytes() == original


def test_cmd_apply_skip_tags(fixtures_dir, tmp_path):
    # -s s applies gain without writing the APE tag (main.rs:1569-1575).
    path = _copy(fixtures_dir, "test_joint_stereo.mp3", tmp_path)
    rc = cli.main(["-q", "-s", "s", "-g", "2", str(path)])
    assert rc == 0
    assert mg.read_ape_tag_from_file(path) is None


def test_cmd_apply_zero_gain(fixtures_dir, tmp_path, capsys):
    path = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    original = path.read_bytes()
    rc = cli.main(["-g", "0", str(path)])
    assert rc == 0
    assert "nothing to do" in capsys.readouterr().out
    assert path.read_bytes() == original


def test_cmd_apply_dry_run(fixtures_dir, tmp_path, capsys):
    path = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    original = path.read_bytes()
    rc = cli.main(["-n", "-g", "2", "-o", "json", str(path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["files"][0]["status"] == "dry_run"
    assert out["summary"]["dry_run"] is True
    assert path.read_bytes() == original


def test_cmd_apply_prevent_clipping(fixtures_dir, tmp_path, capsys):
    # -k caps the gain at headroom (main.rs:1503-1523).
    path = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    headroom = mg.analyze(path).headroom_steps
    rc = cli.main(["-k", "-g", str(headroom + 10), "-o", "json", str(path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    rec = out["files"][0]
    assert rec["gain_applied_steps"] == headroom
    assert "reduced" in rec["warning"]
    assert mg.analyze(path).max_gain == 255


def test_cmd_apply_channel(fixtures_dir, tmp_path, capsys):
    path = _copy(fixtures_dir, "test_stereo.mp3", tmp_path)
    rc = cli.main(["-q", "-l", "1", "-2", str(path)])
    assert rc == 0
    tag = mg.read_ape_tag_from_file(path)
    assert tag.get(mg.TAG_MP3GAIN_UNDO) == "+000,-002,N"


def test_cmd_check_and_delete_tags(fixtures_dir, tmp_path, capsys):
    path = _copy(fixtures_dir, "test_vbr.mp3", tmp_path)
    cli.main(["-q", "-g", "1", str(path)])
    rc = cli.main(["-s", "c", "-o", "tsv", str(path)])
    assert rc == 0
    line = capsys.readouterr().out.strip()
    assert "+001,+001,N" in line
    rc = cli.main(["-q", "-s", "d", str(path)])
    assert rc == 0
    assert mg.read_ape_tag_from_file(path) is None


def test_cmd_temp_file_apply(fixtures_dir, tmp_path):
    path = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    rc = cli.main(["-q", "-t", "-g", "1", str(path)])
    assert rc == 0
    assert mg.analyze(path) is not None
    leftovers = [p for p in tmp_path.iterdir() if "temp" in p.name]
    assert not leftovers


def test_cmd_preserve_timestamp(fixtures_dir, tmp_path):
    import os

    path = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    os.utime(path, (1000000000, 1000000000))
    rc = cli.main(["-q", "-p", "-g", "1", str(path)])
    assert rc == 0
    assert abs(os.stat(path).st_mtime - 1000000000) < 2


def test_recursive_expansion(fixtures_dir, tmp_path, capsys):
    sub = tmp_path / "sub"
    sub.mkdir()
    _copy(fixtures_dir, "test_mono.mp3", sub)
    _copy(fixtures_dir, "test_vbr.mp3", tmp_path)
    (tmp_path / "notes.txt").write_text("ignore me")
    rc = cli.main(["-R", "-o", "json", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["files"]) == 2


def test_no_files_error(capsys):
    rc = cli.main(["-g", "2"])
    assert rc == 1
    assert "no files specified" in capsys.readouterr().err


def test_wrap_mode_cli(fixtures_dir, tmp_path):
    path = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    original = path.read_bytes()
    rc = cli.main(["-q", "-w", "-g", "100", str(path)])
    assert rc == 0
    tag = mg.read_ape_tag_from_file(path)
    assert tag.get(mg.TAG_MP3GAIN_UNDO) == "+100,+100,W"
    # Wrapping is lossless modulo 256: -s s -w -g -100 restores the audio bytes.
    rc = cli.main(["-q", "-s", "s", "-w", "-g", "-100", str(path)])
    assert rc == 0
    from mp3rgain_tpu.ape import remove_ape_tag

    assert remove_ape_tag(path.read_bytes()) == original


def test_degenerate_rate_warning_88200_aac(tmp_path, capsys):
    """88.2 kHz analysis uses a numerically degenerate Yule-Walker table
    row (identical in the reference and mp3gain); the CLI must warn
    instead of silently reporting the bogus gain (round-2 VERDICT #8)."""
    import numpy as np

    from mp3rgain_tpu.testing import avcodec

    sr = 88200
    t = np.arange(sr) / sr
    pcm = (0.3 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    p = tmp_path / "hi882.aac"
    p.write_bytes(avcodec.encode_adts(pcm, sr, 128000))

    rc = cli.main(["-n", "-o", "json", "-r", str(p)])
    assert rc == 0
    cap = capsys.readouterr()
    assert "88200" in cap.err and "unreliable" in cap.err
    out = json.loads(cap.out)
    assert "degenerate" in (out["files"][0].get("warning") or "")


def test_no_degenerate_warning_at_normal_rates(fixtures_dir, tmp_path, capsys):
    path = _copy(fixtures_dir, "test_mono.mp3", tmp_path)
    rc = cli.main(["-n", "-o", "json", "-r", str(path)])
    assert rc == 0
    cap = capsys.readouterr()
    assert "degenerate" not in cap.err and "unreliable" not in cap.err
