from protosam_tpu.data.nifti import NiftiImage, read_nii, write_nii  # noqa: F401
