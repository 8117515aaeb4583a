"""average_precision tests vs sklearn-style manual computation."""

import numpy as np

import jax.numpy as jnp

from esa_pose_estimation_tpu.eval.evaluator import average_precision


def test_perfect_ranking():
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.2, 0.1])
    correct = jnp.asarray([True, True, True, False, False])
    assert float(average_precision(scores, correct)) == 1.0


def test_worst_ranking():
    scores = jnp.asarray([0.9, 0.8, 0.1])
    correct = jnp.asarray([False, False, True])
    np.testing.assert_allclose(float(average_precision(scores, correct)),
                               1.0 / 3.0, rtol=1e-6)


def test_interleaved():
    # hits at ranks 1 and 3: AP = (1/1 + 2/3) / 2
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    correct = jnp.asarray([True, False, True, False])
    np.testing.assert_allclose(float(average_precision(scores, correct)),
                               (1.0 + 2.0 / 3.0) / 2.0, rtol=1e-6)


def test_no_positives_is_zero():
    scores = jnp.asarray([0.9, 0.8])
    correct = jnp.asarray([False, False])
    assert float(average_precision(scores, correct)) == 0.0


def test_pose_nms_write_json(tmp_path):
    """COCO-style export (p_poseNMS.py:283-314 parity): schema, id rules."""
    import json

    import jax.numpy as jnp

    from esa_pose_estimation_tpu.ops import pose_nms

    results = [{
        'imgname': 'images/img_000123.png',
        'result': [{
            'keypoints': jnp.asarray([[1.0, 2.0], [3.0, 4.0]]),
            'kp_score': jnp.asarray([0.9, 0.8]),
            'proposal_score': 1.7,
        }],
    }]
    path = pose_nms.write_json(results, str(tmp_path), for_eval=True)
    data = json.loads(open(path).read())
    assert data[0]['image_id'] == 123
    assert data[0]['category_id'] == 1
    import numpy as np
    np.testing.assert_allclose(data[0]['keypoints'],
                               [1.0, 2.0, 0.9, 3.0, 4.0, 0.8], rtol=1e-6)
    assert abs(data[0]['score'] - 1.7) < 1e-9

    path = pose_nms.write_json(results, str(tmp_path), for_eval=False)
    data = json.loads(open(path).read())
    assert data[0]['image_id'] == 'img_000123.png'
