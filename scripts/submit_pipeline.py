"""spark-submit entry point (north rule: run via spark-submit
--py-files). Thin wrapper over ufuzzy_spark.pipeline.main so the
package ships as a zip:

    scripts/package.sh                       # builds dist/ufuzzy_spark.zip
    spark-submit --py-files dist/ufuzzy_spark.zip \
        scripts/submit_pipeline.py --input pages/ --output out/
"""

import sys
from pathlib import Path

# repo-root imports when run from a checkout (no-op under --py-files)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ufuzzy_spark.pipeline import main

if __name__ == "__main__":
    main()
