/* Parallel file reader for .npy trajectory shards.
 *
 * Datasets are directories of multi-GB .npy shards (reference workflow:
 * batch_generations.py packs 256 trajectories per file). Sequential
 * numpy.load leaves disk bandwidth on the table; this extension reads many
 * shards concurrently with a pthread pool, GIL released, into Python
 * bytearray buffers. Header parsing and array wrapping stay in Python
 * (shadowing_tpu/native/__init__.py) via numpy's own npy-format utilities.
 *
 * Exposed:  _npyloader.read_files_parallel(paths: list[str],
 *                                          n_threads: int = 8)
 *               -> list[bytearray]   (whole-file contents, input order)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <errno.h>
#include <fcntl.h>
#include <pthread.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/stat.h>
#include <unistd.h>

typedef struct {
    const char *path;
    char *buf;        /* destination (bytearray payload, pre-sized) */
    size_t size;
    int error;        /* errno on failure, 0 on success */
} ReadTask;

typedef struct {
    ReadTask *tasks;
    int n_tasks;
    int next;         /* guarded by lock */
    pthread_mutex_t lock;
} TaskQueue;

static void *worker(void *arg)
{
    TaskQueue *q = (TaskQueue *)arg;
    for (;;) {
        pthread_mutex_lock(&q->lock);
        int i = q->next < q->n_tasks ? q->next++ : -1;
        pthread_mutex_unlock(&q->lock);
        if (i < 0)
            return NULL;

        ReadTask *t = &q->tasks[i];
        int fd = open(t->path, O_RDONLY);
        if (fd < 0) {
            t->error = errno;
            continue;
        }
#ifdef POSIX_FADV_SEQUENTIAL
        posix_fadvise(fd, 0, 0, POSIX_FADV_SEQUENTIAL);
#endif
        size_t done = 0;
        while (done < t->size) {
            ssize_t n = pread(fd, t->buf + done, t->size - done, (off_t)done);
            if (n <= 0) {
                t->error = n < 0 ? errno : EIO;
                break;
            }
            done += (size_t)n;
        }
        close(fd);
    }
}

static PyObject *read_files_parallel(PyObject *self, PyObject *args)
{
    PyObject *paths;
    int n_threads = 8;
    if (!PyArg_ParseTuple(args, "O|i", &paths, &n_threads))
        return NULL;
    if (!PyList_Check(paths)) {
        PyErr_SetString(PyExc_TypeError, "paths must be a list of str");
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(paths);
    if (n_threads < 1)
        n_threads = 1;
    if (n_threads > 64)
        n_threads = 64;
    if ((Py_ssize_t)n_threads > n && n > 0)
        n_threads = (int)n;

    PyObject *result = PyList_New(n);
    if (!result)
        return NULL;

    ReadTask *tasks = (ReadTask *)calloc((size_t)(n > 0 ? n : 1),
                                         sizeof(ReadTask));
    if (!tasks) {
        Py_DECREF(result);
        return PyErr_NoMemory();
    }

    /* size every file and allocate its destination bytearray (GIL held) */
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *item = PyList_GET_ITEM(paths, i);
        const char *path = PyUnicode_AsUTF8(item);
        if (!path)
            goto fail;
        struct stat st;
        if (stat(path, &st) != 0) {
            PyErr_SetFromErrnoWithFilenameObject(PyExc_OSError, item);
            goto fail;
        }
        PyObject *buf = PyByteArray_FromStringAndSize(NULL, st.st_size);
        if (!buf)
            goto fail;
        PyList_SET_ITEM(result, i, buf); /* steals ref */
        tasks[i].path = path;            /* borrowed from interned str */
        tasks[i].buf = PyByteArray_AS_STRING(buf);
        tasks[i].size = (size_t)st.st_size;
    }

    TaskQueue q = {tasks, (int)n, 0, PTHREAD_MUTEX_INITIALIZER};
    pthread_t threads[64];
    Py_BEGIN_ALLOW_THREADS
    for (int t = 0; t < n_threads; t++)
        pthread_create(&threads[t], NULL, worker, &q);
    for (int t = 0; t < n_threads; t++)
        pthread_join(threads[t], NULL);
    Py_END_ALLOW_THREADS

    for (Py_ssize_t i = 0; i < n; i++) {
        if (tasks[i].error) {
            errno = tasks[i].error;
            PyErr_SetFromErrnoWithFilename(PyExc_OSError, tasks[i].path);
            goto fail;
        }
    }
    free(tasks);
    return result;

fail:
    free(tasks);
    Py_DECREF(result);
    return NULL;
}

static PyMethodDef methods[] = {
    {"read_files_parallel", read_files_parallel, METH_VARARGS,
     "read_files_parallel(paths, n_threads=8) -> list[bytearray]"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_npyloader",
    "parallel .npy shard reader (pthread pool, GIL released)", -1, methods,
};

PyMODINIT_FUNC PyInit__npyloader(void)
{
    return PyModule_Create(&moduledef);
}
