"""demo.py CLI smoke test (synthetic images, tiny model, CPU)."""

import os
import subprocess
import sys


def test_demo_writes_visualizations(tmp_path):
    env = dict(os.environ)
    out = tmp_path / "vis"
    code = (
        "import sys, jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_compilation_cache_dir','.jax_cache_cpu');"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',5.0);"
        f"sys.argv=['demo.py','--no-restore','--out',{str(out)!r},"
        "'--score-threshold','0.0','--cfg','model.name=retinanet',"
        "'model.num_classes=4','model.fpn_channels=32',"
        "'data.image_size=[128,128]','data.short_side=100',"
        "'data.max_size=128','retinanet.pre_nms_topk=50',"
        "'test.detections_per_image=5'];"
        "exec(open('demo.py').read())"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    files = list(out.glob("*.jpg"))
    assert len(files) == 2, (res.stdout, res.stderr[-500:])
    assert all(f.stat().st_size > 1000 for f in files)
