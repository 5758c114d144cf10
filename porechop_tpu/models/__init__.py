"""Model zoo.

This framework's "models" are the adapter/barcode sequence sets (the
reference keeps them in porechop/adapters.py): 11 chemistry sets, 12
reverse-orientation and 96 forward-orientation barcodes, plus the synthetic
full-context barcode constructors.  They live in porechop_tpu.adapters and
are re-exported here for discoverability.
"""

from ..adapters import (ADAPTERS, Adapter, make_full_native_barcode_adapter,
                        make_new_full_rapid_barcode_adapter,
                        make_old_full_rapid_barcode_adapter)

__all__ = ['ADAPTERS', 'Adapter', 'make_full_native_barcode_adapter',
           'make_new_full_rapid_barcode_adapter',
           'make_old_full_rapid_barcode_adapter']
