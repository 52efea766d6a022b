"""CLI-driven distributed training and decode (VERDICT r2 item 6): the
operator story of the reference (run the tool, get multi-machine
training, ``Controller.py:108-151``) must be reachable from the command
line — ``--distributed`` + ``--set mesh.*`` builds the (data, state)
mesh, trains with the state-sharded E-step, checkpoints the unpadded
bank, and decodes over the data axis."""

import json
import os

import numpy as np
import pytest

from poccala_tpu import cli
from poccala_tpu.io.corpus import UnitInventory, generate_synthetic_corpus
from poccala_tpu.lexicon import PinYin, PronunciationLexicon

UNITS = ["n", "i3", "h", "ao3", "m", "a1"]
TABLE = {"你": ["ni3"], "好": ["hao3"], "马": ["ma1"]}


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clidist")
    inv = UnitInventory(UNITS)
    unit_file = str(tmp / "units.txt")
    inv.save(unit_file)
    audio, label = generate_synthetic_corpus(
        str(tmp / "corp"), inv, num_utts=16, seed=3)
    lex = PronunciationLexicon()
    lex.generate(["你好", "你", "马"], PinYin(TABLE))
    lex_path = str(tmp / "lex.pkl")
    lex.save(lex_path)
    return tmp, unit_file, audio, label, lex_path


class TestCliDistributed:
    def test_train_decode_over_mesh(self, world, capsys):
        tmp, unit_file, audio, label, lex_path = world
        ckpt = str(tmp / "ckpt")
        common = [
            "--units", unit_file,
            "--set", f"paths.audio_file_path={audio}",
            "--set", f"paths.label_file_path={label}",
            "--set", "mesh.data_axis=4",
            "--set", "mesh.state_axis=2",
            "--set", "model.mix_level=1",
            "--set", "model.max_mix_level=1",
            "--set", "train.max_frames=256",
            "--set", "train.max_label_len=8",
            "--set", "train.batch_size=16",
        ]
        cli.main(common + [
            "train", "--mode", "2", "--epochs", "2",
            "--checkpoint", ckpt, "--distributed",
        ])
        err = capsys.readouterr().err
        assert "mesh: {'data': 4, 'state': 2}" in err
        assert os.path.isdir(ckpt)

        wavs = sorted(
            os.path.join(audio, f) for f in os.listdir(audio)
        )[:3]
        cli.main(common + [
            "decode", "--checkpoint", ckpt, "--lexicon", lex_path,
            "--decoder", "device", "--distributed", *wavs,
        ])
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == len(wavs)
        for line in out:
            rec = json.loads(line)
            assert rec["nbest"], rec
            assert all(isinstance(h["words"], list) and h["words"]
                       for h in rec["nbest"])

    def test_distributed_requires_device_tier(self, world):
        tmp, unit_file, audio, label, lex_path = world
        ckpt = str(tmp / "ckpt")
        wav = sorted(os.listdir(audio))[0]
        with pytest.raises(SystemExit):
            cli.main([
                "--units", unit_file,
                "--set", "mesh.data_axis=8", "--set", "mesh.state_axis=1",
                "decode", "--checkpoint", ckpt, "--lexicon", lex_path,
                "--decoder", "vector", "--distributed",
                os.path.join(audio, wav),
            ])
