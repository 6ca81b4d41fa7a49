import io

from delivr_cfos_tpu.utils.hooks import HookEmitter


def test_hook_protocol_format():
    buf = io.StringIO()
    h = HookEmitter(n_stages=3, stream=buf)
    h.overall()
    h.begin_stage()
    h.item(0, 2)
    h.item(1, 2)
    h.begin_stage()
    h.item(0, 1)
    lines = buf.getvalue().strip().splitlines()
    # reference format: __main__.py:85,96
    assert lines == [
        "HOOK:OVERALL:3",
        "HOOK:1:3:0:2",
        "HOOK:1:3:1:2",
        "HOOK:2:3:0:1",
    ]
